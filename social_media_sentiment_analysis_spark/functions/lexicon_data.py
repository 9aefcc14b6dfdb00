"""The engine's sentiment valence lexicon (public-knowledge data).

The reference scores tweets with VADER's ~7.5k-entry valence lexicon
(sentiment_analysis.py:218-247) and TextBlob's pattern lexicon (:249-272).
This module ships the engine's own lexicon in the same spirit: an
AFINN-style list of English words with INTEGER valences in [-5, +5]
(compiled from common public sentiment-word knowledge — strongly negative
words like 'catastrophic' at -4/-5, mild words like 'okay' at +1), expanded
deterministically with regular inflections (plural / past / progressive),
plus VADER-style negator and booster context words.

Integer valences are a deliberate determinism device: per-document scores
are integer SUMS (order-independent, exact in both Spark and DuckDB), so the
whole sentiment pipeline stays verifiable by the SQL oracle — floating point
enters only in the final single-expression normalizations, which both
engines evaluate with an identical op sequence.

Context handling (one-token lookback, mirroring VADER's negation/booster
ideas in integer form):
- negation: a token preceded by a NEGATOR flips sign ('not bad' scores +3).
- boosting: a token preceded by a BOOSTER intensifies one step toward the
  cap ('so excited' scores +4 where 'excited' alone is +3).
- negation wins when the previous token is both.

Token normalization (must stay in lockstep with queries/sqlgen.py::sql_norm
and operators that embed it): lowercase, remove apostrophes (ASCII ' and
typographic ’), strip non-[a-z0-9] runs from both ends. "Don't!" ->
"dont", "(Amazing)" -> "amazing".
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Context word lists (public VADER-style sets).
# ---------------------------------------------------------------------------

NEGATORS: tuple[str, ...] = (
    "not", "no", "never", "neither", "nor", "none", "nothing", "nobody",
    "nowhere", "cannot", "cant", "dont", "doesnt", "didnt", "wont",
    "wouldnt", "shouldnt", "couldnt", "isnt", "arent", "wasnt", "werent",
    "aint", "hardly", "barely", "scarcely", "seldom", "rarely", "without",
    "lacks", "lacking", "lacked", "lack",
)

BOOSTERS: tuple[str, ...] = (
    "very", "really", "extremely", "absolutely", "completely", "totally",
    "utterly", "incredibly", "especially", "particularly", "highly", "so",
    "too", "quite", "remarkably", "exceptionally", "amazingly",
    "unbelievably", "deeply", "enormously", "entirely", "extraordinarily",
    "fully", "greatly", "hugely", "immensely", "intensely", "thoroughly",
    "tremendously", "truly", "super", "insanely", "wildly", "seriously",
    "mega", "uber", "most", "unusually", "purely", "substantially",
)

# ---------------------------------------------------------------------------
# Base valences. AFINN-style integers in [-5, 5]; compiled from public
# sentiment-lexicon knowledge. Inflected forms are generated below; only
# base forms (or irregular forms) need listing here.
# ---------------------------------------------------------------------------

BASE_VALENCES: dict[str, int] = {
    # ---- strongly positive (+4, +5) ----
    "outstanding": 5, "superb": 5, "breathtaking": 5, "masterpiece": 4,
    "magnificent": 4, "phenomenal": 4, "exceptional": 4, "exquisite": 4,
    "flawless": 4, "sublime": 4, "spectacular": 4, "miraculous": 4,
    "amazing": 4, "awesome": 4, "fantastic": 4, "incredible": 4,
    "wonderful": 4, "brilliant": 4, "marvelous": 4, "marvellous": 4,
    "fabulous": 4, "stunning": 4, "thrilled": 4, "ecstatic": 4,
    "overjoyed": 4, "euphoric": 4, "exhilarating": 4, "exhilarated": 4,
    "perfect": 4, "perfection": 4, "heavenly": 4, "glorious": 4,
    "triumphant": 4, "triumph": 4, "bliss": 4, "blissful": 4,
    "adore": 4, "adorable": 4, "beloved": 4, "dazzling": 4,
    "stellar": 4, "legendary": 4, "epic": 4, "unbeatable": 4,
    "magical": 4, "majestic": 4, "splendid": 4, "wondrous": 4,
    "supercharged": 4, "godsend": 4, "jubilant": 4, "elated": 4,
    "rapturous": 4, "radiant": 4, "immaculate": 4, "peerless": 4,
    "matchless": 4, "unsurpassed": 4, "world-class": 4, "topnotch": 4,
    "masterful": 4, "genius": 4, "heroic": 4, "hero": 3,
    # ---- positive (+3) ----
    "excellent": 3, "great": 3, "love": 3, "loved": 3, "loves": 3,
    "loving": 3, "lovely": 3, "best": 3, "beautiful": 3, "beauty": 3,
    "delight": 3, "delightful": 3, "delighted": 3, "excited": 3,
    "exciting": 3, "excitement": 3, "joy": 3, "joyful": 3, "joyous": 3,
    "happy": 3, "happiness": 3, "happier": 3, "happiest": 3,
    "terrific": 3, "superior": 3, "remarkable": 3, "impressive": 3,
    "impressed": 3, "admirable": 3, "admire": 3, "admired": 3,
    "celebrate": 3, "celebrated": 3, "celebration": 3, "cheerful": 3,
    "charming": 3, "charmed": 3, "charm": 3, "elegant": 3, "elegance": 3,
    "enchanting": 3, "enchanted": 3, "graceful": 3, "grateful": 3,
    "gratitude": 3, "thankful": 3, "inspiring": 3, "inspired": 3,
    "inspiration": 3, "inspirational": 3, "paradise": 3, "treasure": 3,
    "victorious": 3, "victory": 3, "win": 3, "winner": 3, "winning": 3,
    "wins": 3, "won": 3, "champion": 3, "success": 3, "successful": 3,
    "succeed": 3, "succeeded": 3, "succeeds": 3, "succeeding": 3,
    "thriving": 3, "thrive": 3, "thrilling": 3, "vibrant": 3,
    "passionate": 3, "passion": 3, "proud": 3, "pride": 3, "praise": 3,
    "praised": 3, "priceless": 3, "favorite": 3, "favourite": 3,
    "ideal": 3, "innovative": 3, "breakthrough": 3, "revolutionary": 3,
    "gorgeous": 3, "handsome": 3, "generous": 3, "generosity": 3,
    "heartwarming": 3, "uplifting": 3, "empowering": 3, "blessed": 3,
    "blessing": 3, "bless": 3, "divine": 3, "angelic": 3, "sweetheart": 3,
    "soulmate": 3, "cherish": 3, "cherished": 3, "devoted": 3,
    "devotion": 3, "faithful": 3, "loyal": 3, "loyalty": 3,
    "trustworthy": 3, "honored": 3, "honoured": 3, "honor": 2,
    "honour": 2, "glee": 3, "gleeful": 3, "merry": 3, "festive": 3,
    "dream": 2, "dreamy": 3, "flourishing": 3, "flourish": 3,
    "prosperous": 3, "prosperity": 3, "prosper": 3, "rejoice": 3,
    "rejoicing": 3, "savior": 3, "saviour": 3, "spotless": 3,
    "unmatched": 3, "accomplished": 3, "accomplishment": 3,
    "achievement": 3, "achieve": 2, "achieved": 2, "congratulations": 3,
    "congrats": 3, "bravo": 3, "kudos": 3, "hurray": 3, "hooray": 3,
    "yay": 3, "woohoo": 3, "wow": 3, "excel": 3, "excelled": 3,
    "excels": 3, "excelling": 3, "masterly": 3, "invaluable": 3,
    # ---- positive (+2) ----
    "good": 2, "nice": 2, "like": 2, "liked": 2, "likes": 2, "liking": 2,
    "enjoy": 2, "enjoyed": 2, "enjoys": 2, "enjoying": 2, "enjoyable": 2,
    "pleased": 2, "pleasing": 2, "pleasant": 2, "pleasure": 2,
    "glad": 2, "fun": 2, "funny": 2, "cool": 2, "neat": 2, "solid": 2,
    "smooth": 2, "friendly": 2, "friend": 2, "friends": 2, "kind": 2,
    "kindness": 2, "helpful": 2, "helped": 2, "helps": 2, "helping": 2,
    "help": 2, "support": 2, "supported": 2, "supportive": 2,
    "supporting": 2, "supports": 2, "useful": 2, "valuable": 2,
    "value": 2, "worthy": 2, "worth": 2, "worthwhile": 2, "positive": 2,
    "optimistic": 2, "optimism": 2, "hopeful": 2, "hope": 2, "hopes": 2,
    "hoping": 2, "promising": 2, "promise": 1, "bright": 2,
    "brighter": 2, "smart": 2, "clever": 2, "wise": 2, "wisdom": 2,
    "strong": 2, "stronger": 2, "strongest": 2, "strength": 2,
    "robust": 2, "reliable": 2, "dependable": 2, "consistent": 2,
    "stable": 2, "secure": 2, "safe": 2, "safely": 2, "safety": 2,
    "comfortable": 2, "comfort": 2, "comforting": 2, "cozy": 2,
    "relaxed": 2, "relaxing": 2, "relax": 2, "calm": 2, "peaceful": 2,
    "peace": 2, "serene": 2, "tranquil": 2, "gentle": 2, "warm": 2,
    "warmth": 2, "welcoming": 2, "welcome": 2, "welcomed": 2,
    "satisfied": 2, "satisfying": 2, "satisfaction": 2, "content": 1,
    "contented": 2, "fulfilled": 2, "fulfilling": 2, "rewarding": 2,
    "reward": 2, "rewarded": 2, "rewards": 2, "benefit": 2,
    "benefits": 2, "beneficial": 2, "advantage": 2, "advantages": 2,
    "advantageous": 2, "gain": 2, "gained": 2, "gains": 2, "gaining": 2,
    "improve": 2, "improved": 2, "improves": 2, "improving": 2,
    "improvement": 2, "improvements": 2, "better": 2, "upgrade": 2,
    "upgraded": 2, "boost": 2, "boosted": 2, "progress": 2,
    "progressing": 2, "growth": 2, "growing": 2, "grow": 1, "grew": 1,
    "recommend": 2, "recommended": 2, "recommends": 2, "recommending": 2,
    "recommendation": 2, "approve": 2, "approved": 2, "approval": 2,
    "agree": 2, "agreed": 2, "agrees": 2, "agreeing": 2, "agreement": 2,
    "appreciate": 2, "appreciated": 2, "appreciates": 2,
    "appreciating": 2, "appreciation": 2, "respect": 2, "respected": 2,
    "respectful": 2, "thanks": 2, "thank": 2, "thanked": 2,
    "thanking": 2, "cute": 2, "attractive": 2, "appealing": 2,
    "fresh": 2, "clean": 2, "crisp": 2, "shiny": 2, "sparkling": 2,
    "rich": 2, "wealthy": 2, "wealth": 2, "luxurious": 2, "luxury": 2,
    "premium": 2, "quality": 2, "refined": 2, "polished": 2,
    "professional": 2, "competent": 2, "capable": 2, "skilled": 2,
    "skillful": 2, "talented": 2, "talent": 2, "gifted": 2,
    "efficient": 2, "effective": 2, "productive": 2, "powerful": 2,
    "energetic": 2, "energized": 2, "lively": 2, "dynamic": 2,
    "healthy": 2, "healthier": 2, "healing": 2, "heal": 2, "healed": 2,
    "recovered": 2, "recovery": 2, "recover": 1, "cure": 2, "cured": 2,
    "honest": 2, "honesty": 2, "sincere": 2, "genuine": 2,
    "authentic": 2, "fair": 2, "fairness": 2, "just": 1, "justice": 2,
    "noble": 2, "brave": 2, "bravery": 2, "courage": 2, "courageous": 2,
    "bold": 2, "confident": 2, "confidence": 2, "determined": 2,
    "determination": 2, "motivated": 2, "motivating": 2, "motivation": 2,
    "eager": 2, "enthusiasm": 2, "enthusiastic": 2, "keen": 2,
    "curious": 1, "interested": 2, "interesting": 2, "engaging": 2,
    "engaged": 2, "entertaining": 2, "entertained": 2, "amused": 2,
    "amusing": 2, "laugh": 2, "laughed": 2, "laughing": 2, "laughter": 2,
    "smile": 2, "smiled": 2, "smiles": 2, "smiling": 2, "grin": 2,
    "grinning": 2, "cheer": 2, "cheered": 2, "cheering": 2, "cheers": 2,
    "play": 1, "playful": 2, "party": 1, "festival": 1, "holiday": 2,
    "vacation": 2, "gift": 2, "gifts": 2, "bonus": 2, "free": 2,
    "freedom": 2, "liberty": 2, "opportunity": 2, "opportunities": 2,
    "lucky": 2, "luck": 2, "fortunate": 2, "fortune": 2, "miracle": 3,
    "popular": 2, "popularity": 2, "famous": 2, "renowned": 2,
    "acclaimed": 3, "awarded": 2, "award": 2, "awards": 2, "prize": 2,
    "medal": 2, "trophy": 2, "honest-to-goodness": 2, "top": 2,
    "soothing": 2, "refreshing": 2, "revitalizing": 2, "rejuvenated": 2,
    "empowered": 2, "encourage": 2, "encouraged": 2, "encouraging": 2,
    "encouragement": 2, "affection": 2, "affectionate": 2, "fond": 2,
    "fondness": 2, "caring": 2, "care": 1, "cared": 1, "cares": 1,
    "compassion": 2, "compassionate": 2, "empathy": 2, "sympathetic": 2,
    "supporter": 2, "ally": 2, "partner": 1, "teamwork": 2,
    "collaborate": 2, "collaboration": 2, "cooperative": 2,
    "cooperation": 2, "united": 2, "unity": 2, "harmony": 2,
    "harmonious": 2, "balanced": 2, "thoughtful": 2, "considerate": 2,
    "polite": 2, "courteous": 2, "gracious": 2, "humble": 2,
    "patient": 2, "patience": 2, "dedicated": 2, "dedication": 2,
    "committed": 2, "commitment": 2, "diligent": 2, "earnest": 2,
    "vigorous": 2, "sturdy": 2, "durable": 2, "resilient": 2,
    "resilience": 2, "versatile": 2, "flexible": 2, "convenient": 2,
    "convenience": 2, "affordable": 2, "bargain": 2, "savings": 2,
    "save": 1, "saved": 1, "saves": 1, "saving": 1, "profit": 2,
    "profitable": 2, "profits": 2, "earn": 1, "earned": 1,
    "earnings": 1, "abundant": 2, "abundance": 2, "plentiful": 2,
    "generously": 2, "vivid": 2, "colorful": 2, "colourful": 2,
    "scenic": 2, "picturesque": 3, "tasty": 2, "delicious": 3,
    "yummy": 3, "savory": 2, "sweet": 2, "sweeter": 2, "fragrant": 2,
    "aromatic": 2, "tender": 2, "juicy": 2, "creative": 2,
    "creativity": 2, "imaginative": 2, "original": 2, "unique": 2,
    "special": 2, "extraordinary": 3, "memorable": 2, "unforgettable": 3,
    "notable": 2, "noteworthy": 2, "significant": 1, "meaningful": 2,
    "insightful": 2, "enlightening": 2, "educational": 1, "informative": 2,
    "clear": 1, "clarity": 2, "simple": 1, "intuitive": 2, "seamless": 2,
    "effortless": 2, "painless": 2, "hassle-free": 2,
    # ---- mildly positive (+1) ----
    "okay": 1, "ok": 1, "alright": 1, "fine": 1, "decent": 1,
    "acceptable": 1, "adequate": 1, "satisfactory": 1, "reasonable": 1,
    "sufficient": 1, "suitable": 1, "proper": 1, "normal": 1,
    "standard": 1, "steady": 1, "able": 1, "ready": 1, "willing": 1,
    "interest": 1, "interests": 1, "new": 1, "newer": 1, "newest": 1,
    "modern": 1, "updated": 1, "useful-ish": 1, "handy": 1, "works": 1,
    "worked": 1, "working": 1, "functional": 1, "correct": 1,
    "correctly": 1, "accurate": 1, "accurately": 1, "precise": 1,
    "true": 1, "truth": 1, "real": 1, "trust": 1, "trusted": 1,
    "share": 1, "shared": 1, "sharing": 1, "open": 1, "available": 1,
    "accessible": 1, "included": 1, "include": 1, "bonus-ish": 1,
    "extra": 1, "plus": 1, "yes": 1, "yeah": 1, "yep": 1, "sure": 1,
    "certainly": 1, "definitely": 1, "absolutely-fine": 1, "agreeable": 1,
    "calmly": 1, "neatly": 1, "nicely": 1, "smoothly": 1, "well": 1,
    "easy": 1, "easier": 1, "easiest": 1, "easily": 1, "quick": 1,
    "quickly": 1, "fast": 1, "faster": 1, "fastest": 1, "speedy": 1,
    "swift": 1, "prompt": 1, "timely": 1, "early": 1, "instant": 1,
    "instantly": 1, "responsive": 1, "big": 1, "bigger": 1,
    "biggest": 1, "large": 1, "larger": 1, "huge-ish": 1, "grand": 2,
    "spacious": 1, "generously-sized": 1, "cheap": 1, "inexpensive": 1,
    # ---- mildly negative (-1) ----
    "slow": -1, "slower": -1, "slowest": -1, "slowly": -1, "sluggish": -2,
    "small": -1, "smaller": -1, "smallest": -1, "tiny": -1, "cramped": -2,
    "late": -1, "later-than-expected": -1, "delay": -1, "delays": -1,
    "delayed": -1, "waiting": -1, "wait": -1, "waited": -1, "queue": -1,
    "meh": -1, "mediocre": -2, "average": -1, "ordinary": -1, "plain": -1,
    "dull": -2, "bland": -1, "boring": -2, "bored": -2, "boredom": -2,
    "tired": -1, "tiring": -1, "tiresome": -2, "weary": -2, "sleepy": -1,
    "unsure": -1, "uncertain": -1, "uncertainty": -1, "doubt": -1,
    "doubts": -1, "doubtful": -1, "skeptical": -1, "sceptical": -1,
    "hesitant": -1, "reluctant": -1, "unclear": -1, "confusing": -2,
    "confused": -2, "confusion": -2, "complicated": -1, "complex": -1,
    "difficult": -2, "difficulty": -2, "difficulties": -2, "hard": -1,
    "harder": -1, "hardest": -1, "tough": -1, "tricky": -1,
    "awkward": -2, "clumsy": -2, "odd": -1, "weird": -1, "strange": -1,
    "unusual": -1, "noisy": -1, "noise": -1, "loud": -1, "crowded": -1,
    "busy": -1, "messy": -2, "mess": -2, "cluttered": -1, "dusty": -1,
    "old": -1, "older": -1, "oldest": -1, "outdated": -2, "obsolete": -2,
    "stale": -1, "expensive": -1, "pricey": -1, "costly": -1,
    "overpriced": -2, "cost": -1, "costs": -1, "fee": -1, "fees": -1,
    "debt": -2, "debts": -2, "owe": -1, "owed": -1, "miss": -1,
    "missed": -1, "missing": -1, "misses": -1, "lost": -2, "lose": -2,
    "loses": -2, "losing": -2, "loss": -2, "losses": -2, "loser": -2,
    "drop": -1, "dropped": -1, "drops": -1, "dropping": -1,
    "decline": -1, "declined": -1, "declining": -1, "decrease": -1,
    "decreased": -1, "decreasing": -1, "down": -1, "downward": -1,
    "fall": -1, "falling": -1, "fell": -1, "weak": -2, "weaker": -2,
    "weakest": -2, "weakness": -2, "fragile": -1, "brittle": -1,
    "unstable": -2, "shaky": -1, "wobbly": -1, "inconsistent": -1,
    "unreliable": -2, "spotty": -1, "glitchy": -2, "buggy": -2,
    "no-good": -2, "limited": -1, "limitation": -1, "limitations": -1,
    "restricted": -1, "restriction": -1, "restrictions": -1,
    "lackluster": -2, "lackadaisical": -1, "minor": -1, "trivial": -1,
    "petty": -1, "shallow": -1, "vague": -1, "generic": -1,
    # ---- negative (-2) ----
    "bad": -3, "poor": -2, "poorly": -2, "worse": -3, "worsening": -3,
    "sad": -2, "sadness": -2, "saddened": -2, "unhappy": -2,
    "disappointed": -2, "disappointing": -2, "disappointment": -2,
    "disappoint": -2, "disappoints": -2, "dissatisfied": -2,
    "displeased": -2, "upset": -2, "upsetting": -2, "annoyed": -2,
    "annoying": -2, "annoy": -2, "annoys": -2, "annoyance": -2,
    "irritated": -2, "irritating": -2, "irritate": -2, "irritation": -2,
    "frustrated": -2, "frustrating": -2, "frustration": -2,
    "frustrate": -2, "frustrates": -2, "bothered": -2, "bothering": -2,
    "bother": -2, "bothers": -2, "troubled": -2, "troubling": -2,
    "trouble": -2, "troubles": -2, "troublesome": -2, "worried": -2,
    "worry": -2, "worries": -2, "worrying": -2, "worrisome": -2,
    "anxious": -2, "anxiety": -2, "nervous": -2, "stress": -2,
    "stressed": -2, "stressful": -2, "tension": -2, "tense": -2,
    "uncomfortable": -2, "discomfort": -2, "unpleasant": -2,
    "unpleasantness": -2, "negative": -2, "pessimistic": -2,
    "pessimism": -2, "hopeless": -3, "helpless": -2, "useless": -2,
    "worthless": -3, "pointless": -2, "meaningless": -2, "futile": -2,
    "vain": -1, "wasted": -2, "waste": -2, "wasting": -2, "wasteful": -2,
    "fail": -2, "failed": -2, "failing": -2, "fails": -2, "failure": -2,
    "failures": -2, "flop": -2, "broken": -2, "break": -1, "breaks": -1,
    "breaking": -1, "broke": -2, "crack": -1, "cracked": -1,
    "damaged": -2, "damage": -2, "damages": -2, "damaging": -2,
    "defective": -2, "defect": -2, "defects": -2, "faulty": -2,
    "fault": -2, "faults": -2, "flaw": -2, "flawed": -2, "flaws": -2,
    "error": -2, "errors": -2, "mistake": -2, "mistakes": -2,
    "mistaken": -2, "wrong": -2, "wrongly": -2, "incorrect": -2,
    "inaccurate": -2, "false": -2, "misleading": -2, "mislead": -2,
    "misled": -2, "problem": -2, "problems": -2, "problematic": -2,
    "issue": -1, "issues": -1, "bug": -2, "bugs": -2, "crash": -2,
    "crashed": -2, "crashes": -2, "crashing": -2, "freeze": -1,
    "frozen": -1, "stuck": -2, "jammed": -1, "blocked": -1, "block": -1,
    "reject": -2, "rejected": -2, "rejection": -2, "rejects": -2,
    "refuse": -2, "refused": -2, "refusal": -2, "denied": -2, "deny": -2,
    "denial": -2, "cancel": -1, "canceled": -1, "cancelled": -1,
    "cancellation": -1, "complain": -2, "complained": -2,
    "complaining": -2, "complaint": -2, "complaints": -2, "protest": -2,
    "protested": -2, "protests": -2, "object": -1, "objection": -1,
    "oppose": -1, "opposed": -1, "opposition": -1, "against": -1,
    "criticize": -2, "criticized": -2, "criticise": -2, "criticised": -2,
    "criticism": -2, "critical": -1, "critique": -1, "blame": -2,
    "blamed": -2, "blames": -2, "blaming": -2, "accuse": -2,
    "accused": -2, "accusation": -2, "suspicious": -2, "suspect": -1,
    "suspected": -1, "distrust": -2, "mistrust": -2, "doubtless-not": -1,
    "unfair": -2, "unjust": -2, "injustice": -2, "biased": -2,
    "bias": -1, "dishonest": -2, "dishonesty": -2, "lie": -2,
    "lied": -2, "lies": -2, "lying": -2, "liar": -3, "liars": -3,
    "cheat": -3, "cheated": -3, "cheater": -3, "cheating": -3,
    "cheats": -3, "fraud": -3, "fraudulent": -3, "scam": -3,
    "scammed": -3, "scammer": -3, "scams": -3, "fake": -2, "faked": -2,
    "phony": -2, "phoney": -2, "counterfeit": -2, "steal": -3,
    "stealing": -3, "stole": -3, "stolen": -3, "theft": -3, "thief": -3,
    "rob": -3, "robbed": -3, "robbery": -3, "greedy": -2, "greed": -2,
    "selfish": -2, "arrogant": -2, "arrogance": -2, "rude": -2,
    "rudely": -2, "rudeness": -2, "impolite": -2, "disrespect": -2,
    "disrespectful": -2, "insult": -2, "insulted": -2, "insulting": -2,
    "insults": -2, "mock": -2, "mocked": -2, "mocking": -2,
    "ridicule": -2, "ridiculed": -2, "ridiculous": -2, "absurd": -2,
    "nonsense": -2, "stupid": -2, "stupidity": -2, "dumb": -2,
    "idiot": -3, "idiotic": -3, "idiots": -3, "fool": -2, "foolish": -2,
    "fooled": -2, "silly": -1, "ignorant": -2, "ignorance": -2,
    "incompetent": -2, "incompetence": -2, "inept": -2, "amateur": -1,
    "amateurish": -2, "unprofessional": -2, "careless": -2,
    "carelessness": -2, "negligent": -2, "negligence": -2, "lazy": -2,
    "laziness": -2, "sloppy": -2, "shoddy": -2, "cheap-looking": -2,
    "flimsy": -2, "ugly": -2, "uglier": -2, "ugliest": -2, "hideous": -3,
    "gross": -2, "dirty": -2, "filthy": -3, "smelly": -2, "stink": -2,
    "stinks": -2, "stinky": -2, "rotten": -3, "spoiled": -2,
    "moldy": -2, "sour": -1, "bitter": -1, "bitterness": -2,
    "tasteless": -1, "bland-tasting": -1, "sick": -2, "sicker": -2,
    "sickness": -2, "ill": -2, "illness": -2, "disease": -2,
    "diseased": -2, "infection": -2, "infected": -2, "injured": -2,
    "injury": -2, "injuries": -2, "wound": -2, "wounded": -2,
    "hurt": -2, "hurting": -2, "hurts": -2, "pain": -2, "painful": -2,
    "pains": -2, "ache": -2, "aching": -2, "sore": -1, "bruised": -1,
    "bleeding": -2, "bleed": -2, "weakly": -2, "faint": -1,
    "exhausted": -2, "exhausting": -2, "exhaustion": -2, "fatigue": -2,
    "fatigued": -2, "drained": -2, "burnout": -2, "overworked": -2,
    "overwhelmed": -2, "overwhelming": -1, "burden": -2, "burdened": -2,
    "struggle": -2, "struggled": -2, "struggles": -2, "struggling": -2,
    "suffer": -2, "suffered": -2, "suffering": -2, "suffers": -2,
    "hardship": -2, "poverty": -2, "hunger": -2, "hungry": -1,
    "starving": -2, "homeless": -2, "unemployed": -2, "unemployment": -2,
    "fired": -2, "layoff": -2, "layoffs": -2, "bankrupt": -3,
    "bankruptcy": -3, "crisis": -3, "crises": -3, "emergency": -2,
    "urgent": -1, "risk": -1, "risks": -1, "risky": -2, "danger": -2,
    "dangerous": -2, "hazard": -2, "hazardous": -2, "unsafe": -2,
    "threat": -2, "threats": -2, "threatened": -2, "threatening": -2,
    "warning": -1, "warnings": -1, "alarm": -1, "alarming": -2,
    "scare": -2, "scared": -2, "scary": -2, "scarier": -2,
    "frightened": -2, "frightening": -2, "fright": -2, "afraid": -2,
    "fear": -2, "feared": -2, "fearful": -2, "fears": -2, "panic": -3,
    "panicked": -3, "dread": -2, "dreaded": -2, "dreadful": -3,
    "lonely": -2, "loneliness": -2, "alone": -1, "isolated": -2,
    "isolation": -2, "abandoned": -2, "abandon": -2, "neglected": -2,
    "neglect": -2, "ignored": -2, "ignore": -1, "ignores": -1,
    "ignoring": -1, "excluded": -2, "unwanted": -2, "unloved": -2,
    "jealous": -2, "jealousy": -2, "envy": -2, "envious": -2,
    "resent": -2, "resentful": -2, "resentment": -2, "grudge": -2,
    "regret": -2, "regrets": -2, "regretted": -2, "regrettable": -2,
    "ashamed": -2, "shame": -2, "shameful": -2, "embarrassed": -2,
    "embarrassing": -2, "embarrassment": -2, "humiliated": -3,
    "humiliating": -3, "humiliation": -3, "guilt": -2, "guilty": -2,
    "offend": -2, "offended": -2, "offensive": -2, "offends": -2,
    "obnoxious": -2, "unacceptable": -2, "intolerable": -3,
    "unbearable": -3, "insufferable": -3, "harsh": -2, "severe": -2,
    "severely": -2, "brutal": -3, "cruel": -3, "cruelty": -3,
    "mean": -2, "nasty": -2, "vicious": -3, "hostile": -2,
    "hostility": -2, "aggressive": -2, "aggression": -2, "angry": -2,
    "anger": -2, "angrier": -2, "angriest": -2, "mad": -2, "madder": -2,
    "furious": -3, "fury": -3, "rage": -3, "raging": -3, "enraged": -3,
    "outraged": -3, "outrage": -3, "outrageous": -2, "hate": -3,
    "hated": -3, "hateful": -3, "hates": -3, "hating": -3, "hatred": -3,
    "despise": -3, "despised": -3, "detest": -3, "loathe": -3,
    "loathing": -3, "disgust": -3, "disgusted": -3, "disgusting": -3,
    "revolting": -3, "repulsive": -3, "vile": -3, "foul": -2,
    "awful": -3, "terrible": -3, "terribly": -3, "horrible": -3,
    "horribly": -3, "horrid": -3, "horrific": -3, "horrifying": -3,
    "horror": -3, "atrocious": -4, "atrocity": -4, "abysmal": -4,
    "appalling": -4, "appalled": -3, "ghastly": -3, "grim": -2,
    "dire": -2, "bleak": -2, "gloomy": -2, "gloom": -2, "dark": -1,
    "darkness": -1, "depressed": -3, "depressing": -3, "depression": -3,
    "despair": -3, "despairing": -3, "desperate": -2, "desperation": -2,
    "miserable": -3, "misery": -3, "sorrow": -2, "sorrowful": -2,
    "grief": -3, "grieving": -3, "mourn": -2, "mourning": -2,
    "heartbroken": -3, "heartbreak": -3, "heartbreaking": -3,
    "devastated": -3, "devastating": -3, "devastation": -3,
    "destroyed": -3, "destroy": -3, "destroying": -3, "destroys": -3,
    "destruction": -3, "destructive": -3, "ruin": -3, "ruined": -3,
    "ruins": -2, "wreck": -2, "wrecked": -2, "collapse": -2,
    "collapsed": -2, "collapsing": -2, "catastrophe": -4,
    "catastrophic": -4, "disaster": -3, "disastrous": -3,
    "calamity": -3, "tragedy": -3, "tragic": -3, "tragically": -3,
    "nightmare": -3, "nightmarish": -3, "hell": -3, "hellish": -3,
    "doom": -2, "doomed": -3, "fatal": -3, "deadly": -3, "lethal": -3,
    "death": -3, "deaths": -3, "dead": -3, "die": -3, "died": -3,
    "dies": -3, "dying": -3, "kill": -3, "killed": -3, "killer": -3,
    "killing": -3, "kills": -3, "murder": -4, "murdered": -4,
    "murderer": -4, "murders": -4, "slaughter": -4, "massacre": -4,
    "suicide": -3, "war": -3, "warfare": -3, "battle": -1, "fight": -2,
    "fighting": -2, "fights": -2, "fought": -2, "conflict": -2,
    "conflicts": -2, "violence": -3, "violent": -3, "violently": -3,
    "attack": -2, "attacked": -2, "attacking": -2, "attacks": -2,
    "assault": -3, "assaulted": -3, "abuse": -3, "abused": -3,
    "abusive": -3, "torture": -4, "tortured": -4, "terror": -3,
    "terrorism": -4, "terrorist": -4, "bomb": -2, "bombed": -2,
    "bombing": -2, "explosion": -2, "exploded": -2, "weapon": -1,
    "weapons": -1, "gun": -1, "guns": -1, "victim": -2, "victims": -2,
    "hostage": -2, "kidnap": -3, "kidnapped": -3, "corrupt": -3,
    "corrupted": -3, "corruption": -3, "bribe": -3, "bribery": -3,
    "criminal": -2, "criminals": -2, "crime": -2, "crimes": -2,
    "illegal": -2, "unlawful": -2, "guilty-verdict": -2, "prison": -2,
    "jail": -2, "arrested": -2, "arrest": -2, "punish": -2,
    "punished": -2, "punishment": -2, "penalty": -1, "fined": -1,
    "sue": -1, "sued": -1, "lawsuit": -1, "betray": -3, "betrayal": -3,
    "betrayed": -3, "traitor": -3, "evil": -3, "wicked": -3,
    "sinister": -2, "toxic": -2, "poison": -2, "poisoned": -2,
    "poisonous": -2, "contaminated": -2, "contamination": -2,
    "polluted": -2, "pollution": -2, "plague": -2, "epidemic": -2,
    "pandemic": -2, "virus": -1, "infected-systems": -2, "malware": -2,
    "hacked": -2, "hack": -1, "breach": -2, "breached": -2, "leak": -1,
    "leaked": -1, "leaks": -1, "exposed": -1, "vulnerable": -2,
    "vulnerability": -2, "exploit": -2, "exploited": -2,
    "exploitation": -2, "manipulate": -2, "manipulated": -2,
    "manipulation": -2, "manipulative": -2, "deceive": -3,
    "deceived": -3, "deceit": -3, "deceptive": -3, "deception": -3,
    "trick": -1, "tricked": -2, "hoax": -2, "conspiracy": -2,
    "propaganda": -2, "censored": -2, "censorship": -2, "ban": -2,
    "banned": -2, "banning": -2, "bans": -2, "forbidden": -1,
    "prohibited": -1, "suspended": -2, "suspension": -2, "expelled": -2,
    "fire": -1, "fires": -1, "burn": -1, "burned": -1, "burning": -1,
    "burnt": -1, "flood": -2, "flooded": -2, "flooding": -2,
    "drought": -2, "famine": -3, "earthquake": -2, "hurricane": -2,
    "tornado": -2, "storm": -1, "storms": -1, "accident": -2,
    "accidents": -2, "wreckage": -2, "debris": -1, "chaos": -2,
    "chaotic": -2, "turmoil": -2, "unrest": -2, "riot": -2, "riots": -2,
    "shortage": -2, "shortages": -2, "deficit": -1, "inflation": -1,
    "recession": -2, "crash-market": -2, "slump": -2, "downturn": -2,
    "plunge": -2, "plunged": -2, "plummet": -2, "plummeted": -2,
    "tumble": -1, "tumbled": -1, "dismal": -3, "dismay": -2,
    "dismayed": -2, "disturbing": -2, "disturbed": -2, "shocking": -2,
    "shocked": -2, "shock": -1, "stunned": -1, "horrendous": -3,
    "lousy": -2, "crummy": -2, "crappy": -3, "pathetic": -2,
    "deplorable": -3, "despicable": -3, "contemptible": -3,
    "contempt": -2, "scorn": -2, "disdain": -2, "disgrace": -2,
    "disgraceful": -3, "scandal": -2, "scandalous": -2, "shady": -2,
    "sketchy": -1, "dubious": -1, "questionable": -1, "inferior": -2,
    "substandard": -2, "subpar": -2, "worst": -3, "unusable": -2,
    "unworkable": -2, "impractical": -1, "inconvenient": -1,
    "inconvenience": -1, "annoyingly": -2, "sadly": -2,
    "unfortunately": -2, "unfortunate": -2, "unlucky": -2,
    "curse": -2, "cursed": -2, "damn": -2, "damned": -2, "darn": -1,
    "sucks": -3, "suck": -3, "sucked": -3, "screwed": -2, "jerk": -2,
    "jerks": -2, "moron": -3, "morons": -3, "imbecile": -3,
    "clown-show": -2, "garbage": -2, "trash": -2, "junk": -2,
    "rubbish": -2, "pile-of-junk": -2, "disservice": -2, "harm": -2,
    "harmed": -2, "harmful": -2, "harming": -2, "harms": -2,
    "hinder": -1, "hindered": -1, "hindrance": -1, "obstacle": -1,
    "obstacles": -1, "setback": -2, "setbacks": -2, "defeat": -2,
    "defeated": -2, "surrender": -1, "quit": -1, "quitting": -1,
    "gave-up": -2, "giveup": -2, "hopelessness": -3, "apathy": -1,
    "apathetic": -1, "indifferent": -1, "cold": -1, "colder": -1,
    "coldest": -1, "freezing": -1, "bitter-cold": -1, "numb": -1,
    "empty": -1, "emptiness": -2, "void": -1, "barren": -1,
    "lifeless": -2, "stagnant": -1, "decay": -2, "decayed": -2,
    "decaying": -2, "deteriorate": -2, "deteriorated": -2,
    "deteriorating": -2, "deterioration": -2, "degrade": -2,
    "degraded": -2, "degrading": -2, "erode": -1, "eroded": -1,
    "erosion": -1, "corrode": -1, "corroded": -1, "rust": -1,
    "rusty": -1, "worn": -1, "worn-out": -2, "tattered": -1,
    "shabby": -2, "grimy": -2, "grime": -1, "soiled": -1, "stained": -1,
    "stain": -1, "blemish": -1, "scratched": -1, "dented": -1,
    "chipped": -1, "torn": -1, "ripped": -1, "shattered": -2,
    "smashed": -2, "crushed": -2, "mangled": -2, "malfunction": -2,
    "malfunctioning": -2, "inoperable": -2, "unresponsive": -1,
    "laggy": -2, "lag": -1, "lags": -1, "lagging": -1, "choppy": -1,
    "jittery": -1, "distorted": -1, "blurry": -1, "fuzzy": -1,
    "grainy": -1, "static-noise": -1, "interference": -1,
    "disconnect": -1, "disconnected": -1, "dropout": -1, "outage": -2,
    "outages": -2, "downtime": -2, "unavailable": -1, "offline": -1,
}

# Sanity: every valence must be a small integer (the whole determinism story
# rests on integer sums).
assert all(isinstance(v, int) and -5 <= v <= 5 and v != 0
           for v in BASE_VALENCES.values())

_NORM_RE_LEAD = re.compile(r"^[^a-z0-9]+")
_NORM_RE_TAIL = re.compile(r"[^a-z0-9]+$")


def normalize_token(tok: str) -> str:
    """Python twin of sqlgen.sql_norm — keep in lockstep.

    lowercase -> drop apostrophes (' and ’) -> strip non-[a-z0-9] runs
    from both ends.
    """
    t = tok.lower().replace("'", "").replace("’", "")
    return _NORM_RE_TAIL.sub("", _NORM_RE_LEAD.sub("", t))


def _inflections(word: str) -> list[str]:
    """Regular English inflections (plural, past, progressive) for a base
    word. Deliberately conservative: hyphenated pseudo-entries and words
    already ending in common inflection suffixes are left alone."""
    if "-" in word or len(word) < 3:
        return []
    out = []
    if word.endswith("e"):
        out = [word + "s", word + "d", word[:-1] + "ing"]
    elif word.endswith("y") and len(word) > 3 and word[-2] not in "aeiou":
        out = [word[:-1] + "ies", word[:-1] + "ied"]
    elif word.endswith(("s", "x", "z", "ch", "sh")):
        out = [word + "es"]
    elif not word.endswith(("ing", "ed")):
        out = [word + "s", word + "ed", word + "ing"]
    return out


def build_lexicon() -> dict[str, int]:
    """BASE_VALENCES + generated inflections. Explicit base entries always
    win over generated forms (e.g. 'lies' is listed at -2 and is not
    overwritten by the plural of any base word)."""
    lex: dict[str, int] = {}
    for w, v in BASE_VALENCES.items():
        for infl in _inflections(w):
            lex.setdefault(infl, v)
    lex.update({normalize_token(w): v for w, v in BASE_VALENCES.items()})
    return {w: v for w, v in sorted(lex.items()) if w}


LEXICON: dict[str, int] = build_lexicon()
_NEGATOR_SET = frozenset(NEGATORS)
_BOOSTER_SET = frozenset(BOOSTERS)


def score_normalized_tokens(norm_tokens: list[str]) -> tuple[int, int, int]:
    """Scorer over ALREADY-normalized tokens — the hot path used by the
    Arrow UDF, which receives tokens normalized JVM-side (regex work stays
    in whole-stage codegen; Python does only dict lookups and integer
    sums).

    Returns (s, pos_n, neg_n): the integer valence sum and the counts of
    tokens whose EFFECTIVE (post-negation) valence is positive / negative.
    """
    s = pos_n = neg_n = 0
    prev = ""
    get = LEXICON.get
    for t in norm_tokens:
        v = get(t, 0)
        if v:
            if prev in _NEGATOR_SET:
                v = -v
            elif prev in _BOOSTER_SET:
                v = min(v + 1, 5) if v > 0 else max(v - 1, -5)
            s += v
            if v > 0:
                pos_n += 1
            else:
                neg_n += 1
        prev = t
    return s, pos_n, neg_n


def score_tokens(raw_tokens: list[str]) -> tuple[int, int, int]:
    """Ground-truth scorer over raw whitespace tokens; the SQL oracle and
    the relational (explode/broadcast-join) plan both mirror this exactly."""
    return score_normalized_tokens([normalize_token(t) for t in raw_tokens])
