"""Manipulation stack: PBD cloth simulation, action spaces, data collection,
MPC planning, and the continual predict-update loop."""
