"""Post-processing toolkit (reference: misc/paftools.js)."""
