from graft.tables import GraftTable

__all__ = ["GraftTable"]
