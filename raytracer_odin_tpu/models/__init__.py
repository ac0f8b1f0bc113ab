# Scene data model (host + device SoA), cameras, materials, and procedural
# test/demo scene generators.
