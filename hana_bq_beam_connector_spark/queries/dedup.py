"""dedup queries — filled in as the operator set lands."""
