"""Block sources: deterministic fixtures (tests/goldens) and JSON-RPC fetch."""
