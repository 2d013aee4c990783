import os

import pytest

from bioreason_tpu.data.chat_template import CHAT_TEMPLATE, render_chat, apply_chat_template
from bioreason_tpu.data.kegg import format_kegg_for_dna_llm, format_kegg_prompt_only

REF_TEMPLATE_PATH = "/root/reference/bioreason/models/dl/chat_template_dl.py"


def _kegg_example():
    return {
        "question": "Which pathway is disrupted?",
        "answer": "p53 signaling pathway",
        "reasoning": "Step one.\nStep two.",
        "reference_sequence": "ACGTACGTACGT",
        "variant_sequence": "ACGTACATACGT",
    }


SAMPLE_MESSAGE_SETS = [
    # user + assistant with reasoning (SFT shape)
    format_kegg_for_dna_llm(_kegg_example())["prompt"],
    # prompt-only (GRPO shape)
    format_kegg_prompt_only(_kegg_example())["prompt"],
    # system + user string content
    [
        {"role": "system", "content": "You are a genomics assistant."},
        {"role": "user", "content": "Hello there"},
    ],
    # multi-turn
    [
        {"role": "user", "content": [{"type": "text", "text": "q1"}]},
        {"role": "assistant", "content": [{"type": "text", "text": "a1"}]},
        {"role": "user", "content": [{"type": "dna", "text": None}, {"type": "text", "text": "q2"}]},
        {"role": "assistant", "reasoning_content": "because", "content": [{"type": "text", "text": "a2"}]},
    ],
]


def _render_with_jinja(template_str, messages, **kw):
    import jinja2

    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True,
                             extensions=["jinja2.ext.loopcontrols"])
    env.globals["raise_exception"] = lambda m: (_ for _ in ()).throw(ValueError(m))
    return env.from_string(template_str).render(messages=messages, **kw)


@pytest.mark.parametrize("i", range(len(SAMPLE_MESSAGE_SETS)))
@pytest.mark.parametrize("gen_prompt", [False, True])
def test_renderer_matches_own_jinja(i, gen_prompt):
    messages = SAMPLE_MESSAGE_SETS[i]
    ours = render_chat(messages, add_generation_prompt=gen_prompt)
    jinja = _render_with_jinja(CHAT_TEMPLATE, messages, add_generation_prompt=gen_prompt)
    assert ours == jinja


@pytest.mark.skipif(not os.path.exists(REF_TEMPLATE_PATH), reason="reference not mounted")
@pytest.mark.parametrize("i", range(len(SAMPLE_MESSAGE_SETS)))
@pytest.mark.parametrize("gen_prompt", [False, True])
def test_renderer_matches_reference_template(i, gen_prompt):
    ns: dict = {}
    with open(REF_TEMPLATE_PATH) as f:
        exec(f.read(), ns)
    ref_template = ns["CHAT_TEMPLATE"]
    messages = SAMPLE_MESSAGE_SETS[i]
    ours = render_chat(messages, add_generation_prompt=gen_prompt)
    ref = _render_with_jinja(ref_template, messages, add_generation_prompt=gen_prompt, tools=None)
    assert ours == ref


def test_enable_thinking_false_adds_empty_think():
    messages = SAMPLE_MESSAGE_SETS[1]
    out = render_chat(messages, add_generation_prompt=True, enable_thinking=False)
    assert out.endswith("<|im_start|>assistant\n<think>\n\n</think>\n\n")


def test_apply_chat_template_sft_truncates_after_answer():
    ex = format_kegg_for_dna_llm(_kegg_example())
    rendered = apply_chat_template(ex)["prompt"]
    assert rendered.endswith("Answer: p53 signaling pathway")
    assert "<think>\nStep one.\nStep two.\n</think>\n\n" in rendered


def test_apply_chat_template_prompt_only_adds_generation_prompt():
    ex = format_kegg_prompt_only(_kegg_example())
    rendered = apply_chat_template(ex)["prompt"]
    assert rendered.endswith("<|im_start|>assistant\n")
    assert rendered.count("<|dna_pad|>") == 2


@pytest.mark.skipif(not os.path.exists(REF_TEMPLATE_PATH), reason="reference not mounted")
def test_add_dna_id_matches_reference_template():
    ns: dict = {}
    with open(REF_TEMPLATE_PATH) as f:
        exec(f.read(), ns)
    messages = SAMPLE_MESSAGE_SETS[0]
    ours = render_chat(messages, add_dna_id=True)
    ref = _render_with_jinja(ns["CHAT_TEMPLATE"], messages, add_generation_prompt=False,
                             add_dna_id=True, tools=None)
    assert ours == ref
    assert "DNA Sequence1:" in ours and "DNA Sequence2:" in ours
