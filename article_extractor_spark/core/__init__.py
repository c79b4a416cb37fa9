"""Pure-Python extraction core (no Spark dependency)."""
