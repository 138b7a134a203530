# Operator modules are imported directly (e.g. `from .operators import joins`);
# no eager re-exports so partially-built modules never block the package.
