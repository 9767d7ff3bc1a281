"""Normative + search compute kernels (batched, integer-exact)."""
