"""Model state: Gaussian fields, mesh anchoring, deformation models, GNN dynamics."""
