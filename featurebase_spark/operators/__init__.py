"""Relational + write operators built on the DataFrame API.

The read-side relational surface (scan/filter/project/join/groupBy/...) is
Spark SQL itself — see SURVEY §2.2 for the 1:1 mapping of the reference's
plan operators onto Catalyst. This package holds what Spark does NOT give
for free: FeatureBase write semantics (:mod:`writes`) and DDL/catalog
emulation (:mod:`ddl`).
"""
