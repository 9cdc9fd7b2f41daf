from .oracle import render_oracle, pack_argb_np  # noqa: F401
