"""Import-satisfying stub for ``torchmeta`` (not installed in this image).

The reference imports torchmeta unconditionally (`train.py:24` pulls in
`trainer/maml_trainer.py:30` and `networks/models.py:23`), but the measured
baseline path (ModelTrainer + ANPShapeNet1D) never calls into it.  Meta*
module aliases are real torch modules so the class *definitions* in
`networks/models.py` execute; MAML training itself is not supported here.
"""
