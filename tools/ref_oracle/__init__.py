"""Run the ACTUAL reference implementation (/root/reference, torch CPU) as a
training-dynamics oracle against npcd_tpu.

Why: every other parity test in this repo re-derives the reference math in a
fresh oracle — an oracle we wrote can encode the same misreading twice. This
package imports the reference's own classes (PointNeRFTraining,
DiffusionTraining, the real torch modules) and steps them next to the
npcd_tpu pipelines on identical data with converter-matched initialization,
so the reference *code* is the ground truth.

The reference targets CUDA + a handful of pip packages absent from this
image; `install_shims()` provides the minimal stand-ins (see shims.py) and
the harness forces the reference's own pure-torch voxel-grid-free kNN
fallback (aggregator.py:42-57), which is the exact semantic npcd_tpu's
nn-validity mode rebuilds.
"""
from .shims import install_shims, import_reference  # noqa: F401
