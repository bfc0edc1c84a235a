from .wrappers import CallbackStats, CompressedModel, TimedModel, WrapperModel

__all__ = ["CallbackStats", "CompressedModel", "TimedModel", "WrapperModel"]
