from .io import read_data, save_data, save_model, load_model  # noqa: F401
