"""Multi-chip scaling over ``jax.sharding.Mesh`` (SURVEY.md §5.8).

The reference is single-process; its serial chunk loop over the Monte
Carlo axis (``fast/fast.py:130-134``) becomes the device-sharded axis here.
"""

from .mesh import make_mesh, run_sharded, sharded_moments
from .scan import make_scan_mesh, run_scan_sharded

__all__ = ["make_mesh", "run_sharded", "sharded_moments",
           "make_scan_mesh", "run_scan_sharded"]
