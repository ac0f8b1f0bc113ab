# Device compute ops: geometry tests, BVH build/traversal, texture sampling,
# BRDF shading, and the wavefront integrator.
