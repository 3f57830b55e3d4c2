"""Query plans: the flagship reference-e2e pipeline and the driver-facing
queries()/oracle_sql() catalog."""
