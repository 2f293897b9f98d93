"""Operator library: each module contributes QuerySpecs to the registry."""
