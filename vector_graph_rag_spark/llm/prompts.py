"""Reference prompt texts + message/cache-key assembly (data parity).

The r11 review's one remaining reference-semantics gap (Missing #4) was
that the reference's PROMPT TEXTS — the extraction system prompt and
one-shot, the NER one-shot, the three rerank few-shots, and the answer
template — were not reproduced, so a live-LLM deployment of this engine
would diverge from the reference even with identical dataflows.  The
constants below are those texts VERBATIM (they are configuration data,
not code: what to send, exactly), each cited to its reference site:

- extraction: extractor.py:32-66 (system prompt, one-shot input/output)
- NER:        extractor.py:70-81 (system, one-shot, template)
- rerank:     reranker.py:14-70  (three few-shot input/output pairs,
              final-turn template)
- answer:     reranker.py:304-310 (AnswerGenerator.ANSWER_PROMPT)

The assembly helpers reproduce the reference's message sequences and —
separately, because they differ — its CACHE-KEY strings:

- extraction messages: system + one-shot user/assistant + "Text: {text}"
  (extractor.py:153-158); cache key = system\\n\\nexample_in\\n\\n
  example_out\\n\\nText: {text} (extractor.py:131-133).
- NER messages: system + one-shot + NER_TEMPLATE.format(q)
  (extractor.py:355-362); cache key per extractor.py:316-318 — note the
  SINGLE newline between the one-shot input and output there, unlike the
  extraction key's double.
- rerank messages: three few-shot user/assistant pairs then the final
  user turn, NO system message (reranker.py:182-191); the final turn is
  RERANK_PROMPT_TEMPLATE (question + relation lines only — the
  instruction text lives only inside the few-shot inputs, so the model
  continues the pattern); the cache key PREPENDS all three examples
  (reranker.py:152-162).
- answer: a single user message (reranker.py:366); the prompt string is
  its own cache key (reranker.py:358-364).
- gpt-5-series API quirk: no `temperature`/`stop` params
  (reranker.py:193-201, 368-374).

Everything here is pure string assembly — unit-pinned in
tests/test_prompts.py (md5 of every constant + the assembly quirks), and
consumed through llm/runner.py's cache-fronted batch operator, whose
prompt_md5 cache column keys on exactly these cache strings.
"""

from __future__ import annotations

# --- triplet extraction (extractor.py:32-66) ---------------------------------

EXTRACTION_SYSTEM_PROMPT = """You are an expert knowledge graph builder. Your task is to extract knowledge triplets from the given text.

A triplet consists of:
- Subject: An entity (person, place, thing, concept, etc.)
- Predicate: The relationship between subject and object
- Object: Another entity

Guidelines:
1. Extract all meaningful relationships from the text
2. Keep entities concise but complete (e.g., "Johann Bernoulli" not just "Johann")
3. Use clear, specific predicates (e.g., "was born in" instead of "relates to")
4. Extract both explicit and implicit relationships
5. Ensure triplets are factually accurate based on the text
6. Do not infer relationships not supported by the text

Return your response as a JSON object with a "triplets" array, where each triplet is an array of [subject, predicate, object].
"""

EXTRACTION_EXAMPLE_INPUT = """Text: Albert Einstein was born in Ulm, Germany in 1879. He developed the theory of relativity, which revolutionized physics. Einstein worked at the Institute for Advanced Study in Princeton."""

EXTRACTION_EXAMPLE_OUTPUT = """{
    "triplets": [
        ["Albert Einstein", "was born in", "Ulm, Germany"],
        ["Albert Einstein", "was born in", "1879"],
        ["Albert Einstein", "developed", "the theory of relativity"],
        ["the theory of relativity", "revolutionized", "physics"],
        ["Albert Einstein", "worked at", "the Institute for Advanced Study"],
        ["the Institute for Advanced Study", "is located in", "Princeton"]
    ]
}"""

# --- query NER (extractor.py:70-81) -------------------------------------------

NER_SYSTEM_PROMPT = "You're a very effective entity extraction system."

NER_ONE_SHOT_INPUT = """Please extract all named entities that are important for solving the questions below.
Place the named entities in json format.

Question: Which magazine was started first Arthur's Magazine or First for Women?

"""

NER_ONE_SHOT_OUTPUT = """{"named_entities": ["First for Women", "Arthur's Magazine"]}"""

NER_TEMPLATE = """
Question: {}

"""

# --- rerank few-shots (reranker.py:14-70) --------------------------------------

RERANK_EXAMPLE_1_INPUT = """I will provide you with a set of relationship descriptions from a knowledge graph. Select exactly 5 relationships most useful for answering this multi-hop question.

Return JSON with "thought_process" and "useful_relations" (list of 5 relation lines, most useful first).

Question:
When did Lothair Ii's mother die?

Relationship descriptions:
[53] bertha married to theobald of arles
[54] bertha married to adalbert ii of tuscany
[42] lothair ii son of ermengarde of tours
[43] lothair ii married to teutberga
[41] lothair ii son of emperor lothair i
[60] lothair ii husband of waldrada
[67] waldrada was mistress of lothair ii

"""

RERANK_EXAMPLE_1_OUTPUT = """{"thought_process": "2-hop question: First find Lothair II's mother (relation [42]: Ermengarde of Tours), then find death date. [41] gives father for family context.", "useful_relations": ["[42] lothair ii son of ermengarde of tours", "[41] lothair ii son of emperor lothair i", "[43] lothair ii married to teutberga", "[60] lothair ii husband of waldrada", "[67] waldrada was mistress of lothair ii"]}"""

RERANK_EXAMPLE_2_INPUT = """I will provide you with a set of relationship descriptions from a knowledge graph. Select exactly 5 relationships most useful for answering this multi-hop question.

Return JSON with "thought_process" and "useful_relations" (list of 5 relation lines, most useful first).

Question:
What country is the composer of "Erta Eterna" from?

Relationship descriptions:
[12] terra eterna composed by paulo flores
[15] paulo flores born in angola
[18] paulo flores genre is semba
[22] angola located in africa
[25] semba originated in angola
[30] paulo flores nationality angolan

"""

RERANK_EXAMPLE_2_OUTPUT = """{"thought_process": "2-hop question: First find composer of Terra Eterna ([12]: Paulo Flores), then find his country ([15] born in Angola or [30] nationality Angolan).", "useful_relations": ["[12] terra eterna composed by paulo flores", "[15] paulo flores born in angola", "[30] paulo flores nationality angolan", "[22] angola located in africa", "[25] semba originated in angola"]}"""

RERANK_EXAMPLE_3_INPUT = """I will provide you with a set of relationship descriptions from a knowledge graph. Select exactly 5 relationships most useful for answering this multi-hop question.

Return JSON with "thought_process" and "useful_relations" (list of 5 relation lines, most useful first).

Question:
Who is the director of the film that won the award also won by "The Hurt Locker"?

Relationship descriptions:
[5] the hurt locker won academy award best picture
[8] the hurt locker directed by kathryn bigelow
[12] moonlight won academy award best picture
[15] moonlight directed by barry jenkins
[20] la la land won golden globe best musical
[25] barry jenkins born in miami

"""

RERANK_EXAMPLE_3_OUTPUT = """{"thought_process": "3-hop question: (1) Find award won by The Hurt Locker ([5]: Academy Award Best Picture), (2) Find another film with same award ([12]: Moonlight), (3) Find director ([15]: Barry Jenkins).", "useful_relations": ["[5] the hurt locker won academy award best picture", "[12] moonlight won academy award best picture", "[15] moonlight directed by barry jenkins", "[8] the hurt locker directed by kathryn bigelow", "[25] barry jenkins born in miami"]}"""

RERANK_PROMPT_TEMPLATE = """Question:
{question}

Relationship descriptions:
{relation_descriptions}

"""

# --- answer generation (reranker.py:304-310) -----------------------------------

ANSWER_PROMPT = """Use the following pieces of retrieved context to answer the question. If there is not enough information in the retrieved context to answer the question, just say that you don't know.

Question: {question}

Context: {context}

Answer:"""


# --- assembly ------------------------------------------------------------------

Message = dict[str, str]

# ``[id] text`` relation lines (reranker.py:141-150) — the one kernel shared
# with the parse/repair side, so prompt building and response repair agree.
from vector_graph_rag_spark.llm.rerank import format_relations as format_relation_lines  # noqa: E402


def extraction_messages(text: str) -> list[Message]:
    """extractor.py:153-158: system + one-shot + the bare ``Text: {text}``."""
    return [
        {"role": "system", "content": EXTRACTION_SYSTEM_PROMPT},
        {"role": "user", "content": EXTRACTION_EXAMPLE_INPUT},
        {"role": "assistant", "content": EXTRACTION_EXAMPLE_OUTPUT},
        {"role": "user", "content": f"Text: {text}"},
    ]


def extraction_cache_key(text: str) -> str:
    """extractor.py:131-133 (double newlines throughout)."""
    return (
        f"{EXTRACTION_SYSTEM_PROMPT}\n\n{EXTRACTION_EXAMPLE_INPUT}\n\n"
        f"{EXTRACTION_EXAMPLE_OUTPUT}\n\nText: {text}"
    )


def ner_messages(question: str) -> list[Message]:
    """extractor.py:355-362."""
    return [
        {"role": "system", "content": NER_SYSTEM_PROMPT},
        {"role": "user", "content": NER_ONE_SHOT_INPUT},
        {"role": "assistant", "content": NER_ONE_SHOT_OUTPUT},
        {"role": "user", "content": NER_TEMPLATE.format(question)},
    ]


def ner_cache_key(question: str) -> str:
    """extractor.py:316-318 — note the SINGLE newline between the one-shot
    input and output, unlike the extraction key's double (reference quirk,
    kept bit-for-bit: a cache written by the reference stays readable)."""
    return (
        f"{NER_SYSTEM_PROMPT}\n\n{NER_ONE_SHOT_INPUT}\n{NER_ONE_SHOT_OUTPUT}\n\n"
        f"{NER_TEMPLATE.format(question)}"
    )


def rerank_messages(question: str, relation_descriptions: str) -> list[Message]:
    """reranker.py:182-191: three few-shot pairs then the final user turn;
    NO system message, and the final turn carries only question +
    relation lines (the instruction text lives in the few-shot inputs)."""
    final = RERANK_PROMPT_TEMPLATE.format(
        question=question, relation_descriptions=relation_descriptions
    )
    return [
        {"role": "user", "content": RERANK_EXAMPLE_1_INPUT},
        {"role": "assistant", "content": RERANK_EXAMPLE_1_OUTPUT},
        {"role": "user", "content": RERANK_EXAMPLE_2_INPUT},
        {"role": "assistant", "content": RERANK_EXAMPLE_2_OUTPUT},
        {"role": "user", "content": RERANK_EXAMPLE_3_INPUT},
        {"role": "assistant", "content": RERANK_EXAMPLE_3_OUTPUT},
        {"role": "user", "content": final},
    ]


def rerank_cache_key(question: str, relation_descriptions: str) -> str:
    """reranker.py:152-162: all three examples PREPENDED to the final turn
    (the examples are part of the key, so editing a few-shot invalidates
    cached selections)."""
    examples = (
        f"{RERANK_EXAMPLE_1_INPUT}\n{RERANK_EXAMPLE_1_OUTPUT}\n\n"
        f"{RERANK_EXAMPLE_2_INPUT}\n{RERANK_EXAMPLE_2_OUTPUT}\n\n"
        f"{RERANK_EXAMPLE_3_INPUT}\n{RERANK_EXAMPLE_3_OUTPUT}\n\n"
    )
    return examples + RERANK_PROMPT_TEMPLATE.format(
        question=question, relation_descriptions=relation_descriptions
    )


def answer_messages(question: str, passages: list[str]) -> list[Message]:
    """reranker.py:357-366: one user message; context = passages joined by
    blank lines.  The prompt string doubles as the cache key."""
    return [{"role": "user", "content": answer_cache_key(question, passages)}]


def answer_cache_key(question: str, passages: list[str]) -> str:
    return ANSWER_PROMPT.format(question=question, context="\n\n".join(passages))


def chat_api_kwargs(
    model: str,
    messages: list[Message],
    json_response: bool = True,
    stop_on_blank: bool = False,
) -> dict:
    """The reference's OpenAI call-kwargs rule (reranker.py:193-201,
    368-374): gpt-5-series models take neither ``temperature`` nor
    ``stop``; everything else runs at temperature 0 (and, for rerank,
    stop=['\\n\\n'])."""
    kwargs: dict = {"model": model, "messages": messages}
    if json_response:
        kwargs["response_format"] = {"type": "json_object"}
    if not model.startswith("gpt-5"):
        kwargs["temperature"] = 0
        if stop_on_blank:
            kwargs["stop"] = ["\n\n"]
    return kwargs
