"""utils — shared helpers (testing model builders, eval, logging)."""
