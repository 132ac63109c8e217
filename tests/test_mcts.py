"""MCTS core tests: UCT math, normalization, selection, widening."""
import math

from detikzify_tpu.mcts import MonteCarlo, Node, Normalizer


def test_normalizer_minmax():
    norm = Normalizer()
    a = norm(1.0)
    b = norm(3.0)
    assert a.value == 0.0 and b.value == 1.0
    norm(5.0)  # range extends; previous scores re-normalize lazily
    assert a.value == 0.0 and b.value == 0.5


def test_normalizer_degenerate_range():
    norm = Normalizer(default_value=0.25)
    a = norm(2.0)
    assert a.value == 0.25  # single score -> default


def test_uct_score():
    parent = Node("root")
    child = Node("c", exploration=0.6)
    parent.add_child(child)
    child.update_win_value(1.0)
    child.update_win_value(0.0)
    # parent now has 2 visits via backprop
    got = child.get_score(parent)
    want = 0.5 + 0.6 * 1.0 * math.sqrt(math.log(2) / 2)
    assert abs(got - want) < 1e-12


def test_widen_node_no_win_term():
    parent = Node("root")
    widen = Node("w", exploration=0.6)
    widen.is_widen_node = True
    widen.update_policy_value(1.0)
    parent.add_child(widen)
    widen.update_win_value(100.0)
    got = widen.get_score(parent)
    assert got == 0.6 * math.sqrt(math.log(1) / 1)  # win term excluded


def test_backprop_reaches_root():
    root = Node("r")
    mid = Node("m")
    leaf = Node("l")
    root.add_child(mid)
    mid.add_child(leaf)
    leaf.update_win_value(2.0)
    assert root.visits == mid.visits == leaf.visits == 1
    assert root.win_value == 2.0


def test_montecarlo_prefers_good_branch():
    """A deterministic bandit: the finder gives branch A reward 1, B reward 0.
    After enough expansions the most-visited child must be A."""
    root = Node("root", exploration=0.3)

    def finder(node, mc):
        if node is root and not node.children:
            for name in ("A", "B"):
                child = Node(name, exploration=0.3)
                child.update_policy_value(1.0)
                node.add_child(child)
            node.children[0].update_win_value(1.0)
            node.children[1].update_win_value(0.0)
        else:
            node.update_win_value(1.0 if node.state == "A" else 0.0)
            leaf = Node(node.state + "'", exploration=0.3)
            leaf.update_policy_value(1.0)
            node.add_child(leaf)

    mc = MonteCarlo(root)
    mc.child_finder = finder
    mc.simulate(expansion_count=30)
    assert mc.make_choice().state == "A"
    assert mc.stats_expansion_count == 30


def test_tree_dump(tmp_path):
    root = Node("root")
    root.add_child(Node("child"))
    path = tmp_path / "tree.dot"
    mc = MonteCarlo(root)
    with open(path, "w") as f:
        mc.print_tree(f)
    text = path.read_text()
    assert text.startswith("graph") and "child" in text
