from bioreason_tpu.data.nt_tokenizer import KmerTokenizer
from bioreason_tpu.data.char_tokenizer import CharDNATokenizer
from bioreason_tpu.data.text_tokenizer import ByteTextTokenizer, SPECIAL_TOKENS
from bioreason_tpu.data.chat_template import CHAT_TEMPLATE, render_chat, apply_chat_template
from bioreason_tpu.data.processor import BioProcessor
