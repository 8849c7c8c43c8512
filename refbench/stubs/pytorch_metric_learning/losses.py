class NTXentLoss:
    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "pytorch_metric_learning stub: contrastive losses are not "
            "supported in the reference baseline harness")
