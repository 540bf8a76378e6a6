"""Operator modules. Importing a module registers its queries/oracles."""
