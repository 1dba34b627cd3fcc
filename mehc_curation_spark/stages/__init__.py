"""Pipeline stages — the graft of the reference's four stage packages
(validation / cleaning / normalization / refinement), each a thin
composable layer over the label-plan builder in `plan.py`."""
