from .node import ConfigNode
from .defaults import get_default_config
from .catalog import VOC_CLASSES, DatasetCatalog

__all__ = ["ConfigNode", "get_default_config", "VOC_CLASSES", "DatasetCatalog"]
