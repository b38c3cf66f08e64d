from atray_tpu.accel.bvh import BVH, build_bvh
from atray_tpu.accel.traverse import bvh_first_hit
