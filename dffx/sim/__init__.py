"""dffx.sim — thin-lens defocus simulator (synthetic in-the-wild focal stacks)."""

from dffx.sim.simulator import (
    DEVICE_PROFILES,
    DeviceProfile,
    coc_layers,
    disc_kernel,
    generate_scene,
    render_focal_slice,
    render_scene_fused,
    render_slice_fused,
    warp_2d,
)

__all__ = [
    "DEVICE_PROFILES",
    "DeviceProfile",
    "coc_layers",
    "disc_kernel",
    "generate_scene",
    "render_focal_slice",
    "render_scene_fused",
    "render_slice_fused",
    "warp_2d",
]
