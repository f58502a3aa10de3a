from .gtm import GTMWriter, GTMReader, GTMDecoder, GTM_COMMANDS  # noqa: F401
from . import lzma_codec  # noqa: F401
