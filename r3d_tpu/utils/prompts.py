"""Fine-grained-label prompt builder (reference utils.py:13-212).

The DARai label taxonomy (coarse L2 list, fine-grained L3 list, and the
coarse->fine candidate mapping) is dataset ground truth reproduced verbatim
as data; the prompt assembly re-implements generate_prompt's observable
format: per-sample chain-of-thought instructions + candidate lists + the
"Answer: <numbers>" contract that the API answer parser expects.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

COARSE_LABELS: List[str] = [
    "Bake_pancake", "Cleaning_Countertops", "Cleaning_Floor", "Get_ingredients",
    "Having_a_meal", "Mix_ingredients", "Prep_ingredients",
    "Prepare_Kitchen_appliance", "Scroll_on_tablet", "Setting_a_table",
    "Take_out_Kitchen_and_cooking_tools", "Take_out_smartphone",
    "Throw_out_leftovers", "Using_Smartphone", "Using_Tablet",
    "Washing_and_Drying_dishes_with_hands",
    "UNDEFINED", "UNDEFINED", "UNDEFINED", "UNDEFINED",
]

FINE_LABELS: List[str] = [
    "Add_batter", "Add_coffee", "Add_flour", "Add_milk", "Add_sugar",
    "Add_water", "Check_cabinet", "Check_pancake", "Check_refrigerator",
    "Clean_with_broom", "Clean_with_mop", "Clean_with_paper_towel",
    "Clean_with_towel", "Conversation_on_the_phone", "Crack_egg", "Drink",
    "Dry_dishes", "Eat", "Fill_coffee_machine_with_water",
    "Fill_kettle_with_water", "Get_coffee", "Get_cup", "Get_filter",
    "Get_instant_coffee_", "Get_pan", "Get_spoon", "Load_dishwasher",
    "Place_cup", "Place_dishes", "Place_drink", "Place_filter", "Place_food",
    "Place_pan", "Place_silverware", "Prepare_for_activity", "Rinse_dishes",
    "Scroll_on_the_phone", "Scroll_on_the_tablet", "Stir_",
    "Stir_pancake_ingredients", "Take_out_Kitchen_and_cooking_tools",
    "Take_out_pancake_ingredients", "Turn_on_coffee_machine",
    "Turn_on_dishwasher", "Turn_on_kettle", "Turn_on_stove",
    "Unloading_dishwasher", "UNDEFINED", "Take_out_smartphone",
    "Throw_out_leftovers",
]

COARSE_TO_FINE: Dict[str, List[str]] = {
    "UNDEFINED": ["UNDEFINED"],
    "Prepare_Kitchen_appliance": [
        "Get_filter", "Place_filter", "Fill_coffee_machine_with_water",
        "Add_coffee", "Place_cup", "Turn_on_coffee_machine",
        "Fill_kettle_with_water", "Turn_on_kettle", "Load_dishwasher",
        "Turn_on_dishwasher", "Unloading_dishwasher", "Turn_on_stove",
    ],
    "Take_out_Kitchen_and_cooking_tools": [
        "Get_cup", "Get_spoon", "Take_out_pancake_ingredients",
    ],
    "Prep_ingredients": [
        "Get_coffee", "Get_instant_coffee_", "Check_refrigerator", "Check_cabinet",
    ],
    "Mix_ingredients": [
        "Add_water", "Add_coffee", "Stir_", "Add_sugar", "Add_flour",
        "Stir_pancake_ingredients", "Add_milk", "Crack_egg",
    ],
    "Using_Smartphone": ["Scroll_on_the_phone", "Conversation_on_the_phone"],
    "Take_out_smartphone": ["Take_out_smartphone"],
    "Throw_out_leftovers": ["Throw_out_leftovers"],
    "Washing_and_Drying_dishes_with_hands": [
        "Place_dishes", "Rinse_dishes", "Dry_dishes",
    ],
    "Get_ingredients": [
        "Take_out_pancake_ingredients", "Check_refrigerator", "Check_cabinet",
    ],
    "Bake_pancake": ["Get_pan", "Place_pan", "Check_pancake", "Add_batter"],
    "Cleaning_Countertops": ["Clean_with_towel", "Clean_with_paper_towel"],
    "Cleaning_Floor": ["Clean_with_mop", "Clean_with_broom", "Clean_with_towel"],
    "Setting_a_table": [
        "Add_water", "Place_drink", "Place_food", "Place_silverware",
        "Take_out_Kitchen_and_cooking_tools",
    ],
    "Having_a_meal": ["Prepare_for_activity", "Eat", "Drink"],
    "Using_Tablet": ["Scroll_on_the_tablet"],
    "Scroll_on_tablet": ["Scroll_on_the_tablet"],
}


def coarse_names(indices: Sequence[int]) -> List[str]:
    """Coarse label indices -> names (utils.py:140-152)."""
    return [COARSE_LABELS[i] for i in indices]


def build_prompt(coarse_label_indices: Sequence[int], n_frames: int) -> str:
    """One labeling prompt for a frame sequence (utils.py:154-212 format)."""
    names = coarse_names(coarse_label_indices)
    seen: List[str] = []
    candidate_lines: List[str] = []
    for name in names:
        if name in COARSE_TO_FINE and name not in seen:
            seen.append(name)
            candidate_lines.append(f"{name}: {', '.join(COARSE_TO_FINE[name])}")
    label_mapping = "\n".join(f"{i} {l}" for i, l in enumerate(FINE_LABELS))
    candidates = "\n".join(candidate_lines)
    return (
        f"You are given {n_frames} time-series of images that are arranged in "
        "chronological order. These images capture a sequence of actions that "
        "unfold over time. Each image has the corresponding coarse-level "
        f"labels as follows: {', '.join(names)}. "
        "Your task is to predict the corresponding fine-grained labels for "
        "each image based only on what you observe in the images. Think step "
        "by step: first describe what you can see, then deduce each "
        "fine-grained label from the candidates below.\n\n"
        f"Answer with exactly {n_frames} numbers in this format:\n"
        "Answer: <ONLY numbers separated by commas>\n"
        "For example: Answer: 39, 39, 39, 2, 2\n\n"
        "Choose labels based solely on observable details (objects, tools, "
        "ingredients, actions). Do not default to the UNDEFINED label, do not "
        "abbreviate, and do not wait for more information.\n\n"
        "For each coarse-level label, choose from these candidates:\n"
        f"{candidates}\n\n"
        "Label mapping:\n"
        f"{label_mapping}\n"
    )


def batch_prompts(coarse_label_batch, n_frames: int) -> List[str]:
    """Per-sample prompts for a [B, T] batch of coarse indices."""
    return [build_prompt(row, n_frames) for row in coarse_label_batch]


def parse_answer(text: str, n_frames: int, fallback: int = 47) -> List[int]:
    """Extract the numeric label list from a model reply
    (chatgpt4o_api.prompt_post_processing:96-132 behavior): find the last
    'Answer:' line, parse comma-separated ints, pad/truncate to n_frames
    with the UNDEFINED index."""
    import re

    labels: List[int] = []
    matches = re.findall(r"Answer:\s*([0-9,\s]+)", text)
    if matches:
        for tok in matches[-1].split(","):
            tok = tok.strip()
            if tok.isdigit():
                labels.append(int(tok))
    if len(labels) > n_frames:
        labels = labels[:n_frames]
    while len(labels) < n_frames:
        labels.append(fallback)
    return labels
