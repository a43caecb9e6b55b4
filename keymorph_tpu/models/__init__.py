from keymorph_tpu.models.layers import (  # noqa: F401
    center_of_mass,
    CenterOfMass,
    LinearRegressor,
    ConvBlock,
)
from keymorph_tpu.models.convnet import ConvNet  # noqa: F401
from keymorph_tpu.models.unet import (  # noqa: F401
    UNet2D,
    UNet3D,
    TruncatedUNet3D,
    ResidualUNet3D,
    ResidualUNetSE3D,
    SimpleUnet,
)
from keymorph_tpu.models.keymorph import KeyMorph, RegistrationResult  # noqa: F401
