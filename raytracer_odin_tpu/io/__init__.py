# Submodules: gltf, images, png, hdr, writers, native. Imported lazily by
# users to keep import costs low and avoid circular imports.
