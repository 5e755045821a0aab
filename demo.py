#!/usr/bin/env python
"""Root entry point mirroring the reference's demo/camera script (SURVEY.md
§1 L6, §3.4). Delegates to tpucenterface.cli.demo."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpucenterface.cli.demo import main

if __name__ == "__main__":
    main()
