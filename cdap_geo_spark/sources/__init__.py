"""Input adapters: relational-table -> interleaved-docs builders."""
