from atray_tpu.kernels.traverse_pallas import (
    TreePack,
    pack_bvh,
    pallas_first_hit,
)
