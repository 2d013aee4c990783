"""Qwen3-style chat template with DNA content parts.

The reference stores one long Jinja template (reference:
bioreason/models/dl/chat_template_dl.py) rendered by HF
`apply_chat_template` (ImmutableSandboxedEnvironment with
trim_blocks=True, lstrip_blocks=True). This module ships:

* `CHAT_TEMPLATE` — an equivalent Jinja template string (kept for HF interop
  and used by tests as the parity oracle via jinja2), and
* `render_chat` — a fast pure-Python renderer producing byte-identical output
  for the message shapes the framework uses (system/user/assistant turns,
  DNA content parts, reasoning_content, add_generation_prompt,
  enable_thinking). The renderer is the production path: the per-batch
  collator calls it in the input pipeline hot loop.

Rendering rules (as exercised by the reference's datasets):
  - leading system turn:  <|im_start|>system\n{content}<|im_end|>\n
  - user turn with list content: <|im_start|>user\n then per part:
      dna  -> [optional 'DNA Sequence{n}:'] <|dna_start|><|dna_pad|><|dna_end|>
      text -> the text verbatim
    then <|im_end|>\n
  - assistant turn AFTER the last user turn, when it is the final message or
    has reasoning: <|im_start|>assistant\n<think>\n{reasoning}\n</think>\n\n
    {content}<|im_end|>\n ; otherwise <|im_start|>assistant\n{content}<|im_end|>\n
  - add_generation_prompt appends <|im_start|>assistant\n
    (+ '<think>\n\n</think>\n\n' when enable_thinking is False)

`apply_chat_template` reproduces trl.data_utils.maybe_apply_chat_template
semantics used by the SFT collator (reference bioreason/dataset/kegg.py:236-238):
prompt-only examples ending in a *user* turn get a generation prompt; examples
ending in an *assistant* turn are rendered with continue_final_message=True,
i.e. the rendered string is truncated right after the final assistant text
(dropping the trailing <|im_end|>\n) so generation/supervision can continue it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

CHAT_TEMPLATE = (
    "{%- set dna_count = namespace(value=0) %}"
    "{%- if messages[0].role == 'system' %}"
    "{{- '<|im_start|>system\n' + messages[0].content + '<|im_end|>\n' }}"
    "{%- endif %}"
    "{%- set ns = namespace(found=false, last_query_index=messages|length - 1) %}"
    "{%- for message in messages[::-1] %}"
    "{%- set index = (messages|length - 1) - loop.index0 %}"
    "{%- if not ns.found and message.role == 'user' %}"
    "{%- set ns.found = true %}"
    "{%- set ns.last_query_index = index %}"
    "{%- endif %}"
    "{%- endfor %}"
    "{%- for message in messages %}"
    "{%- if (message.role == 'user') or (message.role == 'system' and not loop.first) %}"
    "{{- '<|im_start|>' + message.role + '\n' }}"
    "{%- if message.content is string %}"
    "{{- message.content + '<|im_end|>' + '\n' }}"
    "{%- else %}"
    "{%- for content in message.content %}"
    "{%- if content.type == 'dna' or 'dna' in content %}"
    "{%- set dna_count.value = dna_count.value + 1 %}"
    "{%- if add_dna_id %}DNA Sequence{{- dna_count.value }}:{%- endif %}"
    "<|dna_start|><|dna_pad|><|dna_end|>"
    "{%- elif 'text' in content %}"
    "{{- content.text }}"
    "{%- endif %}"
    "{%- endfor %}"
    "{{- '<|im_end|>' + '\n' }}"
    "{%- endif %}"
    "{%- elif message.role == 'assistant' %}"
    "{%- set content = message.content[0].text %}"
    "{%- set reasoning_content = '' %}"
    "{%- if message.reasoning_content is defined and message.reasoning_content is not none %}"
    "{%- set reasoning_content = message.reasoning_content %}"
    "{%- endif %}"
    "{%- if loop.index0 > ns.last_query_index and (loop.last or (not loop.last and reasoning_content)) %}"
    "{{- '<|im_start|>' + message.role + '\n<think>\n' + reasoning_content.strip('\n') + '\n</think>\n\n' + content.lstrip('\n') }}"
    "{%- else %}"
    "{{- '<|im_start|>' + message.role + '\n' + content }}"
    "{%- endif %}"
    "{{- '<|im_end|>' + '\n' }}"
    "{%- endif %}"
    "{%- endfor %}"
    "{%- if add_generation_prompt %}"
    "{{- '<|im_start|>assistant\n' }}"
    "{%- if enable_thinking is defined and enable_thinking is false %}"
    "{{- '<think>\n\n</think>\n\n' }}"
    "{%- endif %}"
    "{%- endif %}"
)


def _part_text(content: Any) -> str:
    """First text of a list-of-parts content, or the string itself."""
    if isinstance(content, str):
        return content
    return content[0]["text"]


def render_chat(
    messages: List[Dict[str, Any]],
    add_generation_prompt: bool = False,
    enable_thinking: Optional[bool] = None,
    add_dna_id: bool = False,
) -> str:
    out: List[str] = []
    n = len(messages)

    # last user-turn index (matches the reference template's ns.last_query_index)
    last_query_index = n - 1
    for i in range(n - 1, -1, -1):
        if messages[i]["role"] == "user":
            last_query_index = i
            break

    dna_count = 0
    for i, msg in enumerate(messages):
        role = msg["role"]
        content = msg.get("content")
        if role == "system" and i == 0:
            out.append(f"<|im_start|>system\n{content}<|im_end|>\n")
        elif role == "user" or role == "system":
            out.append(f"<|im_start|>{role}\n")
            if isinstance(content, str):
                out.append(f"{content}<|im_end|>\n")
            else:
                rendered, dna_count = _render_user_content(content, add_dna_id, dna_count)
                out.append(rendered)
                out.append("<|im_end|>\n")
        elif role == "assistant":
            text = _part_text(content)
            reasoning = msg.get("reasoning_content")
            reasoning = reasoning if reasoning is not None else ""
            if i > last_query_index and (i == n - 1 or reasoning):
                out.append(
                    f"<|im_start|>{role}\n<think>\n{reasoning.strip(chr(10))}\n</think>\n\n{text.lstrip(chr(10))}"
                )
            else:
                out.append(f"<|im_start|>{role}\n{text}")
            out.append("<|im_end|>\n")
        # tool turns are not used by any dataset in the framework

    if add_generation_prompt:
        out.append("<|im_start|>assistant\n")
        if enable_thinking is False:
            out.append("<think>\n\n</think>\n\n")
    return "".join(out)


def _render_user_content(parts: List[Dict[str, Any]], add_dna_id: bool, dna_count: int):
    chunks: List[str] = []
    for part in parts:
        if part.get("type") == "dna" or "dna" in part:
            dna_count += 1
            if add_dna_id:
                chunks.append(f"DNA Sequence{dna_count}:")
            chunks.append("<|dna_start|><|dna_pad|><|dna_end|>")
        elif "text" in part:
            chunks.append(part["text"])
    return "".join(chunks), dna_count


def apply_chat_template(example: Dict[str, Any], **kw) -> Dict[str, Any]:
    """trl-style maybe_apply_chat_template over a {'prompt': messages} example.

    - last turn is 'user'      -> render with add_generation_prompt=True
    - last turn is 'assistant' -> render fully, then truncate right after the
      final assistant text (continue_final_message semantics): the trailing
      '<|im_end|>\n' is dropped, matching what the reference SFT collator
      actually feeds the model.
    """
    messages = example["prompt"]
    last_role = messages[-1]["role"]
    if last_role == "user":
        rendered = render_chat(messages, add_generation_prompt=True, **kw)
    elif last_role == "assistant":
        rendered = render_chat(messages, add_generation_prompt=False, **kw)
        final_text = _part_text(messages[-1]["content"]).strip()
        idx = rendered.rindex(final_text)
        rendered = rendered[: idx + len(final_text)]
    else:
        raise ValueError(f"Unsupported final role: {last_role}")
    return {**example, "prompt": rendered}
