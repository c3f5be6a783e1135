"""Pipeline plans: the medallion raw→bronze→silver→gold refinement."""
