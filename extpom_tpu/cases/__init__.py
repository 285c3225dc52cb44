"""Idealized test-case generators (seamount, channel, basin)."""
