"""Repo tooling (oracle checker, scale-stress harness) — importable so
tests can reuse the comparison logic."""
