"""Full-width sharded-compile validation on the 8-device virtual mesh.

The tiny-config dryrun catches wiring mistakes; this catches TP partition-rule
mistakes that only bite at the DEFAULT widths (192-ch encoder / 256-ch U-Net —
e.g. head_dim divisibility by the model axis). Mirrors what the driver runs via
`__graft_entry__.fullsize_sharded_step` (VERDICT r02 item 4).
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_fullsize_sharded_step_default_config():
    import __graft_entry__ as graft

    assert len(jax.devices()) >= 8
    graft.fullsize_sharded_step(jax.devices()[:8])  # runs 4x2 and 8x1 meshes
