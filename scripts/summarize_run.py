"""Summarize a training run's metrics.jsonl: per-phase aggregates and a
compact text table of the learning trajectory.

    python scripts/summarize_run.py runs/copenhagen_r4 [--every 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--every", type=int, default=5, help="table row stride")
    a = p.parse_args()

    path = os.path.join(a.run_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows = [r for r in rows if "selfplay/games" in r]
    if not rows:
        print("no iterations logged")
        return

    total_games = sum(r["selfplay/games"] for r in rows)
    total_pos = sum(r["selfplay/positions"] for r in rows)
    wall_h = rows[-1]["t"] / 3600  # time since logger creation, incl. compile
    print(
        f"{len(rows)} iterations | {int(total_games)} games | "
        f"{int(total_pos)} positions | {wall_h:.2f} h wall"
    )
    hdr = (
        f"{'iter':>4} {'loss':>6} {'p_loss':>6} {'v_loss':>6} {'att%':>5} "
        f"{'def%':>5} {'draw%':>5} {'len':>5} {'g/h':>6}"
    )
    print(hdr)
    for r in rows[:: a.every] + ([rows[-1]] if (len(rows) - 1) % a.every else []):
        print(
            f"{r['step']:>4} {r.get('train/loss', float('nan')):>6.3f} "
            f"{r.get('train/policy_loss', float('nan')):>6.3f} "
            f"{r.get('train/value_loss', float('nan')):>6.3f} "
            f"{100 * r['selfplay/attacker_win_rate']:>5.1f} "
            f"{100 * r['selfplay/defender_win_rate']:>5.1f} "
            f"{100 * r['selfplay/draw_rate']:>5.1f} "
            f"{r['selfplay/avg_length']:>5.0f} "
            f"{r['selfplay/games_per_hour']:>6.0f}"
        )


if __name__ == "__main__":
    main()
