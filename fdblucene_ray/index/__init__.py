from fdblucene_ray.index.manifest import Manifest, load_manifest, publish_manifest  # noqa: F401
