from .backbone import ResNetFPN  # noqa: F401
from .heads import RPNHead, ClassifierHead, MaskHead  # noqa: F401
from .deeplab import DeepLabV2MSC  # noqa: F401
from .sln import SLNAmodal, init_params  # noqa: F401
