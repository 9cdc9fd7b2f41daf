from .render_fwd import render_fused_raw, pack_scene, TILE_H, TILE_W  # noqa: F401
