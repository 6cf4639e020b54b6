#!/usr/bin/env python
"""Legacy epoch-style trainer entry point.

The reference shipped both tools/train_net.py (epoch loop) and
tools/train_net_step.py (iteration loop); the step trainer supersedes it
there and here. This wrapper keeps the CLI name alive and forwards to the
step trainer (identical args)."""

import sys

import _init_paths  # noqa: F401

if __name__ == "__main__":
    print("train_net.py is the legacy entry point; forwarding to "
          "train_net_step.py (same arguments).", file=sys.stderr)
    import train_net_step

    train_net_step.main()
