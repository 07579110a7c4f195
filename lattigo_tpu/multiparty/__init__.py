"""Multiparty / threshold HE protocols (L5 of the stack).

TPU-native analog of ``multiparty/`` (+ scheme instantiations mpckks/mpbgv):
collective key generation (CPK/RLK/GK), collective key switching (CKS/PCKS),
enc↔share conversion and refresh, and t-out-of-N Shamir thresholdization.
Transport is the application's job — shares are plain pytrees.
"""

from lattigo_tpu.multiparty.protocols import (
    PublicKeyGenProtocol, KeySwitchProtocol, PublicKeySwitchProtocol,
    GaloisKeyGenProtocol, RelinearizationKeyGenProtocol,
    EvaluationKeyGenProtocol,
    NoiseFlooding, sample_crp_qp,
)
from lattigo_tpu.multiparty.threshold import (
    Thresholdizer, Combiner, ShamirPolynomial,
)
from lattigo_tpu.multiparty.additive_shares import (
    AdditiveShare, AdditiveShareBigint,
    new_additive_share, new_additive_share_bigint,
)
from lattigo_tpu.multiparty.sharing_bgv import (
    BGVEncToShareProtocol, BGVShareToEncProtocol,
    BGVMaskedTransformProtocol, BGVRefreshProtocol, MaskedTransformFunc,
)

__all__ = [
    "PublicKeyGenProtocol", "KeySwitchProtocol", "PublicKeySwitchProtocol",
    "EvaluationKeyGenProtocol",
    "GaloisKeyGenProtocol", "RelinearizationKeyGenProtocol",
    "NoiseFlooding", "sample_crp_qp",
    "Thresholdizer", "Combiner", "ShamirPolynomial",
    "BGVEncToShareProtocol", "BGVShareToEncProtocol",
    "BGVMaskedTransformProtocol", "BGVRefreshProtocol", "MaskedTransformFunc",
]
