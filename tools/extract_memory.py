#!/usr/bin/env python
"""Box-rehearsal memory module shim (reference: tools/extract_memory.py).

The ``Mem`` class lives in abr_iod_tpu.memory.rehearsal (fixing the
reference's data-layer→tools layering violation, SURVEY.md §1); this
module re-exports it so code and habits expecting ``tools.extract_memory
.Mem`` keep working.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from abr_iod_tpu.memory.rehearsal import Mem, load_crop_bank  # noqa: F401,E402

__all__ = ["Mem", "load_crop_bank"]
