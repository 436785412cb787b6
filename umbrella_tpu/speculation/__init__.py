from .auto_engine import AutoEngine
from .dynamic_engine import DynamicEngine
from .static_engine import StaticEngine
from .tree import GrowMap
