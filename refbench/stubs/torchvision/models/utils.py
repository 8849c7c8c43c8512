def load_state_dict_from_url(*args, **kwargs):
    raise RuntimeError(
        "torchvision stub: pretrained-URL loading unavailable (no egress); "
        "no shipped reference config sets pretrained=True")
