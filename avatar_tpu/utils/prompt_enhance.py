"""LLM prompt enhancement (cinematic rewriting), host-side and optional.

Re-design of `/root/reference/ltx_video/utils/prompt_enhance_utils.py`:
a Florence-2-style image captioner plus an instruction-tuned LLM rewriter
produce a cinematic prompt from the user prompt (+ conditioning first frame
for i2v). Model loading is the caller's job (any HF caption/chat pair
works); this module holds the prompt templates and orchestration, all
gated so the core framework never imports torch-model machinery.

Note: the reference carries this utility for upstream-config parity, but
its avatar inference flow never wires it in (SURVEY §2.10) — same here.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Union

import numpy as np

logger = logging.getLogger(__name__)

T2V_CINEMATIC_PROMPT = """You are an expert cinematic director with many award winning movies, When writing prompts based on the user input, focus on detailed, chronological descriptions of actions and scenes.
Include specific movements, appearances, camera angles, and environmental details - all in a single flowing paragraph.
Start directly with the action, and keep descriptions literal and precise.
Think like a cinematographer describing a shot list.
Do not change the user input intent, just enhance it.
Keep within 150 words.
For best results, build your prompts using this structure:
Start with main action in a single sentence
Add specific details about movements and gestures
Describe character/object appearances precisely
Include background and environment details
Specify camera angles and movements
Describe lighting and colors
Note any changes or sudden events
Do not exceed the 150 word limit!
Output the enhanced prompt only.
"""

I2V_CINEMATIC_PROMPT = """You are an expert cinematic director with many award winning movies, When writing prompts based on the user input, focus on detailed, chronological descriptions of actions and scenes.
Include specific movements, appearances, camera angles, and environmental details - all in a single flowing paragraph.
Start directly with the action, and keep descriptions literal and precise.
Think like a cinematographer describing a shot list.
Keep within 150 words.
For best results, build your prompts using this structure:
Describe the image first and then add the user input. Image description should be in first priority! Align to the image caption if it contradicts the user text input.
Start with main action in a single sentence
Add specific details about movements and gestures
Describe character/object appearances precisely
Include background and environment details
Specify camera angles and movements
Describe lighting and colors
Note any changes or sudden events
Align to the image caption if it contradicts the user text input.
Do not exceed the 150 word limit!
Output the enhanced prompt only.
"""


def array_to_pil(frame: np.ndarray):
    """[H, W, 3] in [-1, 1] -> PIL image."""
    from PIL import Image

    assert frame.min() >= -1.001 and frame.max() <= 1.001
    return Image.fromarray(
        (np.clip((frame + 1) / 2, 0, 1) * 255).astype(np.uint8)
    )


def generate_cinematic_prompt(
    image_caption_model,
    image_caption_processor,
    prompt_enhancer_model,
    prompt_enhancer_tokenizer,
    prompt: Union[str, List[str]],
    conditioning_items: Optional[List] = None,
    max_new_tokens: int = 256,
) -> List[str]:
    """prompt_enhance_utils.py:64-111 semantics; conditioning items carry
    channels-last media [B, F, H, W, 3]."""
    prompts = [prompt] if isinstance(prompt, str) else list(prompt)

    if conditioning_items is None:
        return _chat_enhance(
            prompt_enhancer_model, prompt_enhancer_tokenizer,
            [
                [
                    {"role": "system", "content": T2V_CINEMATIC_PROMPT},
                    {"role": "user", "content": f"user_prompt: {p}"},
                ]
                for p in prompts
            ],
            max_new_tokens,
        )

    if len(conditioning_items) > 1 or conditioning_items[0].media_frame_number != 0:
        logger.warning(
            "prompt enhancement only supports unconditional or first-frame "
            "conditioning items, returning original prompts"
        )
        return prompts

    media = np.asarray(conditioning_items[0].media_item)
    first_frames = [array_to_pil(media[i, 0]) for i in range(media.shape[0])]
    assert len(first_frames) == len(prompts)

    captions = _caption_images(
        image_caption_model, image_caption_processor, first_frames
    )
    return _chat_enhance(
        prompt_enhancer_model, prompt_enhancer_tokenizer,
        [
            [
                {"role": "system", "content": I2V_CINEMATIC_PROMPT},
                {
                    "role": "user",
                    "content": f"user_prompt: {p}\nimage_caption: {c}",
                },
            ]
            for p, c in zip(prompts, captions)
        ],
        max_new_tokens,
    )


def _caption_images(model, processor, images) -> List[str]:
    """Florence-2 style '<DETAILED_CAPTION>' captioning."""
    import torch

    captions = []
    for image in images:
        inputs = processor(
            text="<DETAILED_CAPTION>", images=image, return_tensors="pt"
        ).to(model.device)
        with torch.no_grad():
            ids = model.generate(
                **inputs, max_new_tokens=1024, num_beams=3, do_sample=False
            )
        text = processor.batch_decode(ids, skip_special_tokens=False)[0]
        parsed = processor.post_process_generation(
            text, task="<DETAILED_CAPTION>",
            image_size=(image.width, image.height),
        )
        captions.append(parsed["<DETAILED_CAPTION>"])
    return captions


def _chat_enhance(model, tokenizer, messages_batch, max_new_tokens) -> List[str]:
    import torch

    out = []
    for messages in messages_batch:
        text = tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        inputs = tokenizer(text, return_tensors="pt").to(model.device)
        with torch.no_grad():
            ids = model.generate(
                **inputs, max_new_tokens=max_new_tokens, do_sample=False
            )
        decoded = tokenizer.decode(
            ids[0][inputs["input_ids"].shape[1]:], skip_special_tokens=True
        )
        out.append(decoded.strip())
    return out
