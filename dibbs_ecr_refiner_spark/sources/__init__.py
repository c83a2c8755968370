from .config_store import ConfigStore, MaintenanceLocked, write_config_tables  # noqa: F401
