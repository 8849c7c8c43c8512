def __getattr__(name):
    raise RuntimeError(f"torchvision stub: transforms.{name} unavailable")
