"""Diagnostics: domain stats, blow-up and CFL guards."""
