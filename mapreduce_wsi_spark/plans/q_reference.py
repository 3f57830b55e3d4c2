"""Reference-fidelity queries: the flagship e2e pipeline (SURVEY.md §2 B3-B5)."""

from __future__ import annotations

from mapreduce_wsi_spark.plans.flagship import flagship, flagship_oracle_sql
from mapreduce_wsi_spark.plans.registry import register

register(
    "flagship_integer_mean",
    oracle=flagship_oracle_sql(),
    note="reference e2e workload: CSV serialize -> positional explode -> "
         "exact integer mean with tripwire (TestMapper.java:23-45, "
         "TestReducer.java:26-38)",
)(flagship)
