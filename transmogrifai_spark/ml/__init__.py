"""ml subpackage: evaluators, model selection, insights."""
