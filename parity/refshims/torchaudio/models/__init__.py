from torchaudio.models import decoder  # noqa: F401
