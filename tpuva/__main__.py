"""`python -m tpuva` — the installed CLI (see tpuva/cli.py)."""

import sys

from tpuva.cli import main

sys.exit(main())
