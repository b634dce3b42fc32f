from .embedders import SemanticsEmbedder, InstanceEmbedder

__all__ = ["SemanticsEmbedder", "InstanceEmbedder"]
