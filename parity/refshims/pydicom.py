"""pydicom stand-in: the parity runs never read DICOM frames."""


def dcmread(*args, **kwargs):
    raise RuntimeError("pydicom is not available in this environment")
