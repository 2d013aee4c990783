from bioreason_tpu.models.qwen3 import init_decoder, decoder_forward, init_cache, cross_entropy_loss
from bioreason_tpu.models.nt_encoder import init_encoder, encoder_forward
from bioreason_tpu.models.fusion import (
    init_fusion, fusion_forward, fused_input_embeddings, splice_embeddings,
    encode_dna, validate_splice,
)
from bioreason_tpu.models.classifier import init_classifier, classifier_forward
from bioreason_tpu.models.api import DnaLLM, DNAClassifier
