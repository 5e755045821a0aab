#!/usr/bin/env python
"""Root entry point mirroring the reference's WIDER test script (SURVEY.md
§1 L6, §3.3). Delegates to tpucenterface.cli.eval_wider."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpucenterface.cli.eval_wider import main

if __name__ == "__main__":
    main()
