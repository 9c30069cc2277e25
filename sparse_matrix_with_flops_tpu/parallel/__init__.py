"""Distributed layer: device meshes, sharded SpGEMM / R-MCL."""
