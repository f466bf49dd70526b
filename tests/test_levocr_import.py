"""Full LevOCR checkpoint import parity vs a torch mirror of
OCR/LevOCR/models.py LevOCRModel (BaseVision + conv4 reduction +
levenshtein_transformer.py encoder/decoder with BERT text embeddings,
separate-q/k/v post-norm layers, tied output heads), scaled down."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as Fn

import tests.test_abinet_import as av
from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_levocr
from advancedliteratemachinery_tpu.models.abinet import ABINetVisionConfig
from advancedliteratemachinery_tpu.models.levocr import LevOCR, LevOCRConfig

DV = 64         # vision d_model
DL = 32         # levt embed dim
VOCAB = 40      # 4 specials + 36 charset
MAXLEN = 10
POS_TEXT = 12   # decoder text_pos_emb length (> MAXLEN: exercises slicing)


class TMHA(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            setattr(self, n, nn.Linear(d, d))

    def forward(self, x, pad_mask=None):  # [B,T,C]; pad_mask True at PAD
        B, T, C = x.shape
        hd = C // self.heads
        q = self.q_proj(x).view(B, T, self.heads, hd)
        k = self.k_proj(x).view(B, T, self.heads, hd)
        v = self.v_proj(x).view(B, T, self.heads, hd)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / hd ** 0.5
        if pad_mask is not None:
            s = s.masked_fill(pad_mask[:, None, None, :], -1e9)
        a = torch.softmax(s, -1)
        o = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, C)
        return self.out_proj(o)


class TDecLayer(nn.Module):
    """fairseq TransformerDecoderLayer, post-norm, cross-attn unused."""

    def __init__(self, d, heads, ffn):
        super().__init__()
        self.self_attn = TMHA(d, heads)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, ffn)
        self.fc2 = nn.Linear(ffn, d)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, pad_mask=None):
        x = self.self_attn_layer_norm(x + self.self_attn(x, pad_mask))
        return self.final_layer_norm(x + self.fc2(Fn.relu(self.fc1(x))))


class TBertEmb(nn.Module):
    def __init__(self, vocab, d, max_pos):
        super().__init__()
        self.word_embeddings = nn.Embedding(vocab, d)
        self.position_embeddings = nn.Embedding(max_pos, d)
        self.token_type_embeddings = nn.Embedding(2, d)
        self.LayerNorm = nn.LayerNorm(d)

    def forward(self, tokens):
        T = tokens.shape[1]
        pos = torch.arange(T)[None]
        e = (self.word_embeddings(tokens) + self.position_embeddings(pos)
             + self.token_type_embeddings(torch.zeros_like(tokens)))
        return self.LayerNorm(e)


class TLevtEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.text_embeddings = TBertEmb(VOCAB, DL, VOCAB)
        self.layers = nn.ModuleList([TDecLayer(DL, 2, 64)])

    def forward(self, tokens):
        x = self.text_embeddings(tokens)
        pad_mask = tokens.eq(1)   # fairseq padding_idx
        for layer in self.layers:
            x = layer(x, pad_mask)
        return x


class TLevtDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed_tokens = nn.Embedding(VOCAB, DL, padding_idx=1)
        self.output_projection = nn.Linear(DL, VOCAB, bias=False)
        self.output_projection.weight = self.embed_tokens.weight
        self.embed_mask_ins = nn.Embedding(256, DL * 2)
        self.embed_word_del = nn.Embedding(2, DL)
        self.token_type_embeddings = nn.Embedding(2, DL)
        self.img_embed_dim = nn.Linear(DV, DL, bias=False)
        self.text_pos_emb = nn.Parameter(torch.randn(1, POS_TEXT, DL) * 0.02)
        self.img_pos_emb = nn.Parameter(torch.randn(1, 96, DL) * 0.02)
        self.layers = nn.ModuleList([TDecLayer(DL, 2, 64)])

    def fuse(self, text_feature, img_feature):
        T = text_feature.shape[1]
        t = (text_feature + self.text_pos_emb[:, :T]
             + self.token_type_embeddings.weight[0])
        im = (self.img_embed_dim(img_feature) + self.img_pos_emb
              + self.token_type_embeddings.weight[1])
        x = torch.cat([t, im], 1)
        for layer in self.layers:
            x = layer(x)
        return x, T

    def forward_mask_ins(self, text_feature, img_feature):
        f, T = self.fuse(text_feature, img_feature)
        pair = torch.cat([f[:, :-1], f[:, 1:]], 2)
        return Fn.linear(pair, self.embed_mask_ins.weight)[:, : T - 1]

    def forward_word_ins(self, text_feature, img_feature):
        f, T = self.fuse(text_feature, img_feature)
        return self.output_projection(f)[:, :T]

    def forward_word_del(self, text_feature, img_feature):
        f, T = self.fuse(text_feature, img_feature)
        return Fn.linear(f, self.embed_word_del.weight)[:, :T]


class TLevOCR(nn.Module):
    def __init__(self):
        super().__init__()
        self.vision = av.TBaseVision(h=8, w=32)
        self.conv4_1 = nn.Conv2d(DV, DV, 2, (2, 1), (0, 1), bias=False)
        self.bn4_1 = nn.BatchNorm2d(DV)
        self.conv4_2 = nn.Conv2d(DV, DV, 2, 1, 0, bias=False)
        self.bn4_2 = nn.BatchNorm2d(DV)
        self.levt = nn.Module()
        self.levt.encoder = TLevtEncoder()
        self.levt.decoder = TLevtDecoder()

    def extract_img_feature(self, fmap):
        x = Fn.relu(self.bn4_1(self.conv4_1(fmap)))
        x = Fn.relu(self.bn4_2(self.conv4_2(x)))
        return x.flatten(2).permute(0, 2, 1)   # [B, 96, DV]

    def forward(self, image, noised, masked):
        # vision features come back as the transformer fmap [B, DV, 8, 32]
        f = self.vision.backbone.resnet(image)
        n, c, h, w = f.shape
        seq = f.flatten(2).permute(2, 0, 1)
        seq = seq + torch.from_numpy(av.sincos_positions(h * w, c))[:, None]
        for layer in self.vision.backbone.transformer.layers:
            seq = layer(seq)
        fmap = seq.permute(1, 2, 0).reshape(n, c, h, w)
        vecs = self.vision.attention(fmap)
        vision_logits = self.vision.cls(vecs)

        img = self.extract_img_feature(fmap)
        tf = self.levt.encoder(noised)
        tfm = self.levt.encoder(masked)
        return {
            "vision_logits": vision_logits,
            "mask_ins_logits": self.levt.decoder.forward_mask_ins(tf, img),
            "word_ins_logits": self.levt.decoder.forward_word_ins(tfm, img),
            "word_del_logits": self.levt.decoder.forward_word_del(tf, img),
        }


class TestLevOCRImport:
    def test_all_heads_match(self):
        av.D, av.T, av.NC = DV, 6, 37
        torch.manual_seed(0)
        tm = TLevOCR().eval()

        cfg = LevOCRConfig(
            max_len=MAXLEN, d_model=DL, heads=2, ffn=64, layers=1,
            vision=ABINetVisionConfig(max_length=6, num_classes=37,
                                      d_model=DV, ffn=256))
        model = LevOCR(cfg, policy=FP32_POLICY)
        img = np.random.default_rng(0).standard_normal(
            (2, 32, 128, 3)).astype(np.float32)
        rng = np.random.default_rng(1)
        noised = jnp.asarray(rng.integers(0, VOCAB, (2, MAXLEN), np.int32))
        masked = jnp.asarray(rng.integers(0, VOCAB, (2, MAXLEN), np.int32))
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                               noised, masked, train=False)
        variables = import_levocr(tm.state_dict(), dict(variables))

        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                      torch.from_numpy(np.asarray(noised).astype(np.int64)),
                      torch.from_numpy(np.asarray(masked).astype(np.int64)))
        jout = model.apply(variables, jnp.asarray(img), noised, masked,
                           train=False)
        for key in ("vision_logits", "mask_ins_logits", "word_ins_logits",
                    "word_del_logits"):
            np.testing.assert_allclose(
                np.asarray(jout[key]), tout[key].numpy(),
                rtol=3e-3, atol=3e-3, err_msg=key)
