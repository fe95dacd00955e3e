#!/usr/bin/env python3
"""Interactive env driver (reference: scripts/manual_control.py:16-160).

Examples:
    python scripts/manual_control.py MiniWorld-Hallway-v0
    python scripts/manual_control.py MiniWorld-Maze-v0 --top-view \
        --record-dir /tmp/ds --obs-width 512 --obs-height 512
    python scripts/manual_control.py MiniWorld-OneRoom-v0 --headless \
        --steps 500 --record-dir /tmp/ds    # no display needed
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("env_name", nargs="?", default="MiniWorld-Hallway-v0")
    p.add_argument("--domain-rand", action="store_true")
    p.add_argument("--top-view", action="store_true")
    p.add_argument("--obs-width", type=int, default=512)
    p.add_argument("--obs-height", type=int, default=512)
    p.add_argument("--window-scale", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--record-dir", type=str, default=None)
    p.add_argument("--record-fps", type=int, default=30)
    p.add_argument("--headless", action="store_true",
                   help="scripted random policy, no display")
    p.add_argument("--steps", type=int, default=1000,
                   help="steps for --headless mode")
    p.add_argument("--device", default="cpu", choices=["cpu", "default"],
                   help="single-env interactive stepping defaults to "
                        "the CPU backend: per-step renders through a "
                        "remote-TPU tunnel stall on round-trip latency")
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from miniworld_tpu.gym_env import MiniWorldGym

    env = MiniWorldGym(
        args.env_name.replace("MiniWorld-", "").replace("-v0", ""),
        obs_width=args.obs_width, obs_height=args.obs_height,
        domain_rand=args.domain_rand,
    )

    if args.headless:
        from miniworld_tpu.manual_control import ScriptedControl

        ScriptedControl(env, "random", args.record_dir,
                        fps=args.record_fps).run(args.steps, seed=args.seed)
        print(f"ran {args.steps} steps"
              + (f"; dataset at {args.record_dir}" if args.record_dir else ""))
        return

    from miniworld_tpu.manual_control import ManualControl

    ManualControl(env, record_dir=args.record_dir, fps=args.record_fps,
                  top_view=args.top_view,
                  window_scale=args.window_scale).run(seed=args.seed)


if __name__ == "__main__":
    main()
