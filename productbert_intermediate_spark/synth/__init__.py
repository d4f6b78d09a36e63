"""Deterministic synthetic fixtures (FIXTURES.md): pages, offers_truth, labeled_pairs_gs."""
