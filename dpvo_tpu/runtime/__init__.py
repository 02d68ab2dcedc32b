from .dpvo import DPVO

__all__ = ['DPVO']
