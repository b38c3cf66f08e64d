from atray_tpu.dist.mesh import (
    make_device_mesh,
    render_sharded,
    trace_sharded,
)
from atray_tpu.dist.train import make_train_step
from atray_tpu.dist.treelet import (
    build_treelet_accels,
    build_treelet_parts,
    build_treelets,
    render_treelet,
)
