from .xla_lookup import lookup_kmers

__all__ = ["lookup_kmers"]
