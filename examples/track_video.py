#!/usr/bin/env python
"""End-to-end example: track moving objects in a video and produce
trajectories, a statistics report, and an annotated debug movie.

    python examples/track_video.py input.mp4 out_dir/
    python examples/track_video.py --demo out_dir/   # synthetic demo clip

This is the installed CLI (`tpuva` / `python -m tpuva`); kept here as a
runnable example path for source checkouts. See tpuva/cli.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuva.cli import main

if __name__ == "__main__":
    sys.exit(main())
