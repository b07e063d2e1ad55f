from .mode import QuantMode
