from wmfml_tpu.aug.image_aug import PIPELINES, build_augmenter
from wmfml_tpu.aug.pipeline import build_episode_processor

# named-augmenter parity with the reference's four classes
# (utils/augment.py Augmenter/PascalAugmenter, dataset/*.py task augmenters):
# each is a factory returning augment(key, images)
Augmenter = lambda: build_augmenter("shapenet_3d")            # noqa: E731
PascalAugmenter = lambda: build_augmenter("pascal_1d")        # noqa: E731
AugmenterShapeNet1D = lambda: build_augmenter("shapenet_1d")  # noqa: E731
AugmenterDistractor = lambda: build_augmenter("distractor")   # noqa: E731

__all__ = [
    "PIPELINES",
    "build_augmenter",
    "build_episode_processor",
    "Augmenter",
    "PascalAugmenter",
    "AugmenterShapeNet1D",
    "AugmenterDistractor",
]
