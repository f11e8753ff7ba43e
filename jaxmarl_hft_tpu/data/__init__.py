from .lobster import LobsterLoader, LoadedData
from .synthetic import generate_loaded_data, generate_day
