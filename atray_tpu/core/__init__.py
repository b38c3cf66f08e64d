from atray_tpu.core.camera import Camera, make_camera, camera_rays
from atray_tpu.core import intersect
