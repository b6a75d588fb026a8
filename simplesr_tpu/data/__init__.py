"""Data layer: host decode + fused on-device batch preparation."""

from simplesr_tpu.data.pipeline import DataPipeline, read_img

__all__ = ["DataPipeline", "read_img"]
