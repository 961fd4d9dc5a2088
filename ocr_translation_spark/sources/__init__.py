from .catalog import Catalog  # noqa: F401
