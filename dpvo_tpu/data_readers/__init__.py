from .factory import dataset_factory

__all__ = ['dataset_factory']
