"""Mozilla-readability-style scoring fallback.

Semantics port of `/root/reference/src/full_text_parser/readability/
mod.rs:59-769` including its quirks the goldens depend on: byte-length
thresholds, the ``BLOCKQUITE`` (sic) scoring key (real BLOCKQUOTE scores
0), comma counting via ``split(',').count()`` (= commas+1), and the
4-attempt flag-degradation retry harness."""

from __future__ import annotations

from . import constants, util
from .dom import Document, Node
from .metadata import Article
from .urlutil import Url


class State:
    __slots__ = (
        "strip_unlikely", "weigh_classes", "clean_conditionally",
        "should_remove_title_header", "byline",
    )

    def __init__(self):
        self.strip_unlikely = True
        self.weigh_classes = True
        self.clean_conditionally = True
        self.should_remove_title_header = True
        self.byline: str | None = None


def extract(html: str, base_url: Url | None = None) -> str:
    """Standalone readability (`readability/mod.rs:25-57`)."""
    from . import metadata
    from .config import ConfigEntry
    from .fulltext import (parse_html_with_config, post_process_document,
                           prep_content)
    from .xpath import Context

    empty_config = ConfigEntry()
    url = base_url if base_url is not None else Url.parse("http://fakehost/test/base/")
    document = parse_html_with_config(html, None, empty_config)
    ctx = Context(document)
    prep_content(ctx, None, empty_config, url, document, None)
    article = Article(url)

    article_document = Document()
    root = Node.new_element("article", document)
    article_document.set_root_element(root)

    metadata.extract(ctx, None, None, article)
    extract_body(document, root, article.title)
    post_process_document(article_document)

    html_out = util.serialize(root)
    article.html = html_out
    return html_out


def _get_content_score(node: Node) -> float | None:
    v = node.get_attribute(constants.SCORE_ATTR)
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        return None


def _set_content_score(node: Node, score: float) -> None:
    # Rust f64 Display: integral values print without ".0"
    if score == int(score) and abs(score) < 1e16:
        node.set_attribute(constants.SCORE_ATTR, str(int(score)))
    else:
        node.set_attribute(constants.SCORE_ATTR, repr(score))


def _check_byline(node: Node, match_string: str, state: State) -> bool:
    if state.byline is not None:
        return False
    rel = node.get_attribute("rel") == "author"
    itemprop_attr = node.get_attribute("itemprop")
    itemprop = itemprop_attr is not None and "author" in itemprop_attr
    # content is only consulted when one of the three indicators fires —
    # skipping the subtree text walk for the (overwhelming) non-byline
    # case is observably identical
    if not (rel or itemprop) and not constants.BYLINE.search(match_string):
        return False
    content = node.get_content()
    if rel or itemprop or _is_valid_byline(content):
        state.byline = content.strip()
        return True
    return False


def _is_valid_byline(line: str) -> bool:
    length = util.blen(line.strip())
    return 0 < length < 100


def _initialize_node(node: Node, state: State) -> None:
    name = node.get_name().upper()
    if name == "DIV":
        score = 5
    elif name in ("PRE", "TD", "BLOCKQUITE"):  # sic: BLOCKQUOTE scores 0
        score = 3
    elif name in ("ADDRESS", "OL", "UL", "DL", "DD", "DT", "LI", "FORM"):
        score = -3
    elif name in ("H1", "H2", "H3", "H4", "H5", "H6", "TH"):
        score = -5
    else:
        score = 0
    class_weight = util.get_class_weight(node) if state.weigh_classes else 0
    _set_content_score(node, float(score + class_weight))


def extract_body(document: Document, root: Node, title: str | None) -> bool:
    """`readability/mod.rs:59-698`."""
    from .fulltext import post_process_page

    state = State()
    attempts: list[tuple[Node, int, Document]] = []
    document_cache = document.dup()

    while True:
        elements_to_score: list[Node] = []
        node: Node | None = document.get_root_element()

        while node is not None:
            node_ref = node
            tag_name = node_ref.get_name().upper()

            if tag_name == "TEXT" and node_ref.get_content().strip() == "":
                node = util.next_node(node_ref, True)
                continue

            match_string = util.get_signature(node_ref)

            if not util.is_probably_visible(node_ref):
                node = util.remove_and_next(node_ref)
                continue

            if _check_byline(node_ref, match_string, state):
                node = util.remove_and_next(node_ref)
                continue

            if state.should_remove_title_header and util.header_duplicates_title(
                node_ref, title
            ):
                state.should_remove_title_header = False
                node = util.remove_and_next(node_ref)
                continue

            if state.strip_unlikely:
                if (
                    constants.UNLIELY_CANDIDATES.search(match_string)
                    and not constants.OKAY_MAYBE_ITS_A_CANDIDATE.search(match_string)
                    and not util.has_ancestor_tag(node_ref, "table")
                    and not util.has_ancestor_tag(node_ref, "code")
                    and tag_name != "BODY"
                    and tag_name != "A"
                ):
                    node = util.remove_and_next(node_ref)
                    continue
                role = node_ref.get_attribute("role")
                if role is not None and role in constants.UNLIKELY_ROLES:
                    node = util.remove_and_next(node_ref)
                    continue

            if tag_name in (
                "DIV", "SECTION", "HEADER", "H1", "H2", "H3", "H4", "H5", "H6"
            ) and util.is_element_without_content(node_ref):
                node = util.remove_and_next(node_ref)
                continue

            if tag_name in constants.DEFAULT_TAGS_TO_SCORE:
                elements_to_score.append(node_ref)

            if tag_name == "DIV":
                # Put phrasing content into paragraphs.
                p: Node | None = None
                for child in node_ref.get_child_nodes():
                    if util.is_phrasing_content(child):
                        if p is not None:
                            p.add_child(child)
                        elif not util.is_whitespace(child):
                            new_node = Node.new_element("p", document)
                            node_ref.replace_child_node(new_node, child)
                            new_node.add_child(child)
                            p = new_node
                    elif p is not None:
                        for r_node in reversed(p.get_child_nodes()):
                            if util.is_whitespace(r_node):
                                r_node.unlink()
                                continue
                            break
                        p = None

                if util.has_single_tag_inside_element(node_ref, "P") and \
                        util.get_link_density(node_ref) < 0.25:
                    new_node = node_ref.get_first_element_child()
                    parent = node_ref.get_parent()
                    if new_node is not None and parent is not None and \
                            not isinstance(parent, Document):
                        parent.replace_child_node(new_node, node_ref)
                        node = util.next_node(new_node, False)
                        elements_to_score.append(new_node)
                        continue
                elif not util.has_child_block_element(node_ref):
                    node_ref.set_name("P")
                    elements_to_score.append(node_ref)

            node = util.next_node(node_ref, False)

        candidates: list[Node] = []
        for element_to_score in elements_to_score:
            parent = element_to_score.get_parent()
            if parent is None or isinstance(parent, Document):
                continue
            inner_text = util.get_inner_text(element_to_score, True)
            inner_text_len = util.blen(inner_text)
            if inner_text_len < 25:
                continue
            ancestors = util.get_node_ancestors(element_to_score, 5)
            if not ancestors:
                continue

            content_score = 0.0
            content_score += 1.0
            content_score += float(len(inner_text.split(",")))
            content_score += min(float(inner_text_len // 100), 3.0)

            for level, ancestor in enumerate(ancestors):
                anc_tag = ancestor.get_name().upper()
                anc_parent = ancestor.get_parent()
                if anc_parent is None or isinstance(anc_parent, Document) or \
                        anc_tag == "HTML":
                    continue
                if _get_content_score(ancestor) is None:
                    _initialize_node(ancestor, state)
                    candidates.append(ancestor)
                if level == 0:
                    score_divider = 1.0
                elif level == 1:
                    score_divider = 2.0
                else:
                    score_divider = level * 3.0
                score = _get_content_score(ancestor)
                if score is not None:
                    _set_content_score(ancestor, score + content_score / score_divider)

        for candidate in candidates:
            content_score = _get_content_score(candidate)
            if content_score is not None:
                _set_content_score(
                    candidate,
                    content_score * (1.0 - util.get_link_density(candidate)),
                )

        candidates.sort(
            key=lambda n: _get_content_score(n) if _get_content_score(n) is not None else 0.0,
            reverse=True,
        )
        top_candidates = candidates[:5]

        needed_to_create_top_candidate = False
        if top_candidates:
            top_candidate = top_candidates[0]
        else:
            doc_root = document.get_root_element()
            if doc_root is None:
                return False
            body = next(
                (
                    n
                    for n in doc_root.get_child_elements()
                    if n.get_name().upper() == "BODY"
                ),
                None,
            )
            base = body if body is not None else doc_root
            new_top_candidate = Node.new_element("DIV", document)
            for child in base.get_child_elements():
                new_top_candidate.add_child(child)
            base.add_child(new_top_candidate)
            _initialize_node(new_top_candidate, state)
            needed_to_create_top_candidate = True
            top_candidate = new_top_candidate

        alternative_candidate_ancestors = []
        top_score = _get_content_score(top_candidate)
        if top_score is not None:
            for candidate in top_candidates[1:]:
                score = _get_content_score(candidate) or 0.0
                # Rust f64 semantics when top_score == 0: inf/NaN compares
                ratio_ok = (
                    (score > 0.0) if top_score == 0.0 else (score / top_score >= 0.75)
                )
                if ratio_ok:
                    alternative_candidate_ancestors.append(
                        util.get_node_ancestors(candidate, None)
                    )

        if len(alternative_candidate_ancestors) >= constants.MINIMUM_TOPCANDIDATES:
            parent_of_top_candidate = top_candidate.get_parent()
            while parent_of_top_candidate is not None and not isinstance(
                parent_of_top_candidate, Document
            ):
                if parent_of_top_candidate.get_name().upper() == "BODY":
                    break
                lists_containing_this_ancestor = 0
                tmp = min(
                    len(alternative_candidate_ancestors),
                    constants.MINIMUM_TOPCANDIDATES,
                )
                for ancestors in alternative_candidate_ancestors[:tmp]:
                    lists_containing_this_ancestor += sum(
                        1 for n in ancestors if n is parent_of_top_candidate
                    )
                if lists_containing_this_ancestor >= constants.MINIMUM_TOPCANDIDATES:
                    top_candidate = parent_of_top_candidate
                    break
                parent_of_top_candidate = parent_of_top_candidate.get_parent()

        if _get_content_score(top_candidate) is None:
            _initialize_node(top_candidate, state)

        parent_of_top_candidate = top_candidate.get_parent()
        last_score = _get_content_score(top_candidate) or 0.0
        score_threshold = last_score / 3.0

        while parent_of_top_candidate is not None and not isinstance(
            parent_of_top_candidate, Document
        ) and not util.has_tag_name(parent_of_top_candidate, "BODY"):
            parent_score_opt = _get_content_score(parent_of_top_candidate)
            if parent_score_opt is None:
                parent_of_top_candidate = parent_of_top_candidate.get_parent()
                continue
            parent_score = parent_score_opt
            if parent_score < score_threshold:
                break
            if parent_score > last_score:
                top_candidate = parent_of_top_candidate
                break
            last_score = parent_score_opt
            parent_of_top_candidate = parent_of_top_candidate.get_parent()

        parent_of_top_candidate = top_candidate.get_parent()
        while (
            parent_of_top_candidate is not None
            and not isinstance(parent_of_top_candidate, Document)
            and not util.has_tag_name(parent_of_top_candidate, "BODY")
            and len(parent_of_top_candidate.get_child_elements()) == 1
        ):
            top_candidate = parent_of_top_candidate
            parent_of_top_candidate = top_candidate.get_parent()

        if _get_content_score(top_candidate) is None:
            _initialize_node(top_candidate, state)

        article_content = Node.new_element("DIV", document)
        sibling_score_threshold = max(
            10.0, (_get_content_score(top_candidate) or 0.0) * 0.2
        )
        parent_of_top_candidate = top_candidate.get_parent()
        siblings = (
            parent_of_top_candidate.get_child_elements()
            if parent_of_top_candidate is not None
            and not isinstance(parent_of_top_candidate, Document)
            else None
        )

        if siblings is not None:
            for sibling in siblings:
                append = False
                score = _get_content_score(sibling) or 0.0
                if top_candidate is sibling:
                    append = True
                else:
                    content_bonus = 0.0
                    sibling_classes = sibling.get_class_names()
                    tc_classes = top_candidate.get_class_names()
                    if tc_classes and sibling_classes and all(
                        cls in tc_classes for cls in sibling_classes
                    ):
                        content_bonus += (
                            _get_content_score(top_candidate) or 0.0
                        ) * 0.2
                    if score + content_bonus >= sibling_score_threshold:
                        append = True
                    elif sibling.get_name().upper() == "P":
                        link_density = util.get_link_density(sibling)
                        node_content = util.get_inner_text(sibling, True)
                        node_length = util.blen(node_content)
                        if node_length > 80 and (
                            link_density < 0.25
                            or (
                                node_length > 0
                                and link_density == 0.0
                                and constants.SIBLING_CONTENT.search(node_content)
                            )
                        ):
                            append = True

                if append:
                    if sibling.get_name().upper() not in \
                            constants.ALTER_TO_DIV_EXCEPTIONS:
                        sibling.set_name("DIV")
                    article_content.add_child(sibling)

        if state.clean_conditionally:
            post_process_page(article_content)

        if needed_to_create_top_candidate:
            top_candidate.set_property("id", "readability-page-1")
        else:
            div = Node.new_element("DIV", document)
            div.set_property("id", "readability-page-1")
            for child in article_content.get_child_nodes():
                div.add_child(child)
            article_content.add_child(div)

        text = util.get_inner_text(article_content, True)
        text_length = util.blen(text)

        if text_length < constants.DEFAULT_CHAR_THRESHOLD:
            if state.strip_unlikely:
                state.strip_unlikely = False
                attempts.append((article_content, text_length, document))
            elif state.weigh_classes:
                state.weigh_classes = False
                attempts.append((article_content, text_length, document))
            elif state.clean_conditionally:
                state.clean_conditionally = False
                attempts.append((article_content, text_length, document))
            else:
                attempts.append((article_content, text_length, document))
                attempts.sort(key=lambda t: t[1])
                if attempts:
                    best_attempt, _len, _doc = attempts.pop()
                    for child in best_attempt.get_child_nodes():
                        root.add_child(child)
                    return True
                return False
            document = document_cache.dup()
        else:
            for child in article_content.get_child_nodes():
                root.add_child(child)
            return True
