"""Host-side helpers: validation, dtype aliases, page reading."""
