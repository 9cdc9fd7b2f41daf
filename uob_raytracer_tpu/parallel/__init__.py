from .mesh import make_mesh, pad_triangles, select_devices  # noqa: F401
from .render import render_image_sharded  # noqa: F401
from .train import train_step, image_loss, fit, DEFAULT_LRS  # noqa: F401
from .multihost import initialize_multihost, global_mesh  # noqa: F401
