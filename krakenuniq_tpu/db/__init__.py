from .device_db import DeviceDB, load_database_dir

__all__ = ["DeviceDB", "load_database_dir"]
