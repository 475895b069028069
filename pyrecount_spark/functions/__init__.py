"""Scalar function layer (SURVEY.md §2.7): all native Catalyst expressions,
zero Python UDFs — every function here stays inside whole-stage codegen."""
