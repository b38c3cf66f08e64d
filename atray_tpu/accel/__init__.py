from atray_tpu.accel.bvh import BVH, build_bvh, validate_bvh
from atray_tpu.accel.shaded import ShadedWideBVH, build_shaded_accel
from atray_tpu.accel.traverse import bvh_first_hit
from atray_tpu.accel.wide import (
    HybridAccel,
    WideBVH,
    build_wide_bvh,
    make_accel,
    refit_wide,
    wide_from_mesh,
)
