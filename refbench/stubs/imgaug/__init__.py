"""Import-satisfying stub for ``imgaug`` (not installed in this image).

Used ONLY by scripts/ref_baseline.py, which runs the actual reference
implementation (/root/reference) with ``aug_list=["task_aug"]`` so no
augmenter is ever constructed.  The reference imports imgaug at module
scope (`utils/augment.py:18-19`, `dataset/shapenet_1d.py:22-23`) and seeds
it (`train.py:39`); these names make those statements succeed.  Any attempt
to actually build or run an augmenter raises.
"""

ALL = "ALL"


def seed(entropy):  # train.py:39 — imgaug.seed(config.seed)
    del entropy


class random:  # imgaug.random.seed API surface
    @staticmethod
    def seed(entropy):
        del entropy


from . import augmenters  # noqa: E402,F401  (import imgaug.augmenters as iaa)
