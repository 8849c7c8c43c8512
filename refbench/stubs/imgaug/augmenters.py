"""Stub ``imgaug.augmenters``: importable, but unusable by design.

The baseline measurement runs the reference without data_aug, so no
augmenter class is ever instantiated; see package docstring.
"""


def __getattr__(name):
    def _unavailable(*args, **kwargs):
        raise RuntimeError(
            f"imgaug stub: augmenter {name!r} is not available — the "
            "reference baseline must run with aug_list excluding 'data_aug'")

    return _unavailable
