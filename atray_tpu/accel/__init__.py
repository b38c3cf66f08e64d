from atray_tpu.accel.bvh import BVH, build_bvh, validate_bvh
from atray_tpu.accel.traverse import bvh_first_hit
from atray_tpu.accel.wide import (
    HybridAccel,
    WideBVH,
    build_wide_bvh,
    make_accel,
    wide_from_mesh,
)
