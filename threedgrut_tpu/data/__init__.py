"""Dataset factory (threedgrut/datasets/__init__.py:70 equivalent)."""

from .protocols import Batch, BoundedMultiViewDataset  # noqa: F401


def make(name: str, config, ray_jitter=None):
    """Instantiate train+val datasets by config type."""
    dtype = config.dataset.type
    down = config.dataset.get("downsample_factor", 1)
    if dtype == "nerf":
        from .nerf import NeRFDataset
        train = NeRFDataset(config.path, split="train", downsample=down,
                            bg_color=config.model.background.color)
        val = NeRFDataset(config.path, split="val", downsample=down,
                          bg_color=config.model.background.color)
        return train, val
    if dtype == "colmap":
        from .colmap import ColmapDataset
        return (ColmapDataset(config.path, split="train", downsample=down),
                ColmapDataset(config.path, split="test", downsample=down))
    if dtype == "scannetpp":
        from .colmap import ScannetppDataset
        return (ScannetppDataset(config.path, split="train", downsample=down),
                ScannetppDataset(config.path, split="test", downsample=down))
    if dtype == "ncore":
        from .ncore import NCoreDataset
        return (NCoreDataset(config.path, split="train"),
                NCoreDataset(config.path, split="val"))
    raise ValueError(f"unknown dataset type {dtype}")
