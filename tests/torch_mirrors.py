"""PyTorch mirror models used as the independent parity reference in tests.

These re-express the architectures of the reference package (AutoVC
auto-encoder, GE2E speaker encoder, WaveRNN) in plain torch, with state-dict
names matching the reference modules so that
``autovc_tpu.utils.torch_compat`` converts them directly.  They serve the
role the real pretrained checkpoints would (none are shipped — the only large
blob is missing, /root/reference/.MISSING_LARGE_BLOBS).
"""
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


class ConvNorm(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size=5, padding=2, bias=True):
        super().__init__()
        self.conv = nn.Conv1d(in_ch, out_ch, kernel_size, padding=padding,
                              bias=bias)

    def forward(self, x):
        return self.conv(x)


class LinearNorm(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_layer = nn.Linear(in_dim, out_dim)

    def forward(self, x):
        return self.linear_layer(x)


class MirrorEncoder(nn.Module):
    def __init__(self, dim_neck=32, dim_emb=256, freq=32, n_mels=80):
        super().__init__()
        self.dim_neck, self.freq = dim_neck, freq
        self.convolutions = nn.ModuleList([
            nn.Sequential(ConvNorm(n_mels + dim_emb if i == 0 else 512, 512),
                          nn.BatchNorm1d(512)) for i in range(3)])
        self.lstm = nn.LSTM(512, dim_neck, 2, batch_first=True,
                            bidirectional=True)

    def forward(self, x, c_org):
        x = torch.cat((x, c_org.unsqueeze(-1).expand(-1, -1, x.size(-1))), 1)
        for conv in self.convolutions:
            x = F.relu(conv(x))
        outputs, _ = self.lstm(x.transpose(1, 2))
        out_f = outputs[:, :, :self.dim_neck]
        out_b = outputs[:, :, self.dim_neck:]
        codes_f = [out_f[:, i, :] for i in range(self.freq - 1,
                                                 outputs.size(1), self.freq)]
        codes_b = [out_b[:, i, :] for i in range(0, outputs.size(1),
                                                 self.freq)]
        return codes_f, codes_b


class MirrorDecoder(nn.Module):
    def __init__(self, dim_neck=32, dim_emb=256, dim_pre=512, n_mels=80):
        super().__init__()
        self.lstm1 = nn.LSTM(dim_neck * 2 + dim_emb, dim_pre, 1,
                             batch_first=True)
        self.convolutions = nn.ModuleList([
            nn.Sequential(ConvNorm(dim_pre, dim_pre),
                          nn.BatchNorm1d(dim_pre)) for _ in range(3)])
        self.lstm2 = nn.LSTM(dim_pre, 1024, 2, batch_first=True)
        self.linear_projection = LinearNorm(1024, n_mels)

    def forward(self, x):
        x, _ = self.lstm1(x)
        x = x.transpose(1, 2)
        for conv in self.convolutions:
            x = F.relu(conv(x))
        x = x.transpose(1, 2)
        outputs, _ = self.lstm2(x)
        return self.linear_projection(outputs)


class MirrorPostnet(nn.Module):
    def __init__(self, n_mels=80):
        super().__init__()
        chans = [n_mels, 512, 512, 512, 512, n_mels]
        self.convolutions = nn.ModuleList([
            nn.Sequential(ConvNorm(chans[i], chans[i + 1]),
                          nn.BatchNorm1d(chans[i + 1])) for i in range(5)])

    def forward(self, x):
        for i in range(4):
            x = torch.tanh(self.convolutions[i](x))
        return self.convolutions[4](x)


class MirrorAutoVC(nn.Module):
    """Full generator with the paper-consistent down/upsampling
    (reference auto_encoder/model.py:68-146)."""

    def __init__(self, dim_neck=32, dim_emb=256, dim_pre=512, freq=32,
                 n_mels=80):
        super().__init__()
        self.encoder = MirrorEncoder(dim_neck, dim_emb, freq, n_mels)
        self.decoder = MirrorDecoder(dim_neck, dim_emb, dim_pre, n_mels)
        self.postnet = MirrorPostnet(n_mels)
        self.freq = freq

    def forward(self, x, c_org, c_trg):
        codes_f, codes_b = self.encoder(x, c_org)
        content = torch.cat([torch.cat(codes_f, -1),
                             torch.cat(codes_b, -1)], -1)
        if c_trg is None:
            return content
        T = x.size(-1)
        up_f = torch.cat([c.unsqueeze(-1).expand(-1, -1, self.freq)
                          for c in codes_f], -1)
        tail = codes_f[-1].unsqueeze(-1).expand(-1, -1, T - up_f.size(-1))
        up_f = torch.cat([up_f, tail], -1)
        up_b = torch.cat([c.unsqueeze(-1).expand(-1, -1, self.freq)
                          for c in codes_b], -1)[:, :, :T]
        code_exp = torch.cat([up_f, up_b], dim=1)
        dec_in = torch.cat(
            (code_exp, c_trg.unsqueeze(-1).expand(-1, -1, T)), dim=1)
        mel = self.decoder(dec_in.transpose(1, 2)).transpose(2, 1)
        post = self.postnet(mel)
        return mel, mel + post, content


class MirrorSpeakerEncoder(nn.Module):
    """GE2E d-vector model (reference speaker_encoder/model.py:49-90)."""

    def __init__(self, input_size=40, hidden_size=256, embedding_size=256,
                 num_layers=3):
        super().__init__()
        self.lstm = nn.LSTM(input_size, hidden_size, num_layers,
                            batch_first=True)
        self.linear = nn.Linear(hidden_size, embedding_size)

    def forward(self, utterances):
        _, (hidden, _) = self.lstm(utterances)
        raw = F.relu(self.linear(hidden[-1]))
        return raw / torch.norm(raw, dim=1, keepdim=True)


class MirrorResBlock(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.conv1 = nn.Conv1d(dims, dims, 1, bias=False)
        self.conv2 = nn.Conv1d(dims, dims, 1, bias=False)
        self.batch_norm1 = nn.BatchNorm1d(dims)
        self.batch_norm2 = nn.BatchNorm1d(dims)

    def forward(self, x):
        h = F.relu(self.batch_norm1(self.conv1(x)))
        h = self.batch_norm2(self.conv2(h))
        return x + h


class MirrorMelResNet(nn.Module):
    def __init__(self, res_blocks, in_dims, compute_dims, res_out_dims, pad):
        super().__init__()
        self.conv_in = nn.Conv1d(in_dims, compute_dims, 2 * pad + 1,
                                 bias=False)
        self.batch_norm = nn.BatchNorm1d(compute_dims)
        self.layers = nn.ModuleList(
            [MirrorResBlock(compute_dims) for _ in range(res_blocks)])
        self.conv_out = nn.Conv1d(compute_dims, res_out_dims, 1)

    def forward(self, x):
        x = F.relu(self.batch_norm(self.conv_in(x)))
        for f in self.layers:
            x = f(x)
        return self.conv_out(x)


class MirrorUpsample(nn.Module):
    def __init__(self, feat_dims=80, upsample_factors=(5, 5, 11),
                 compute_dims=128, res_blocks=10, res_out_dims=128, pad=2):
        super().__init__()
        total = int(np.prod(upsample_factors))
        self.indent = pad * total
        self.total = total
        self.factors = upsample_factors
        self.resnet = MirrorMelResNet(res_blocks, feat_dims, compute_dims,
                                      res_out_dims, pad)
        layers = []
        for s in upsample_factors:
            conv = nn.Conv2d(1, 1, (1, 2 * s + 1), padding=(0, s), bias=False)
            conv.weight.data.fill_(1.0 / (2 * s + 1))
            layers += [None, conv]  # placeholder keeps odd conv indices
        self.up_layers = nn.ModuleList([l if l is not None else nn.Identity()
                                        for l in layers])

    def forward(self, m):
        aux = self.resnet(m).unsqueeze(1)
        aux = aux.repeat_interleave(self.total, dim=-1).squeeze(1)
        x = m.unsqueeze(1)
        for s, conv in zip(self.factors, self.up_layers[1::2]):
            x = x.repeat_interleave(s, dim=-1)
            x = conv(x)
        x = x.squeeze(1)[:, :, self.indent:-self.indent]
        return x.transpose(1, 2), aux.transpose(1, 2)


class MirrorWaveRNN(nn.Module):
    """Teacher-forced WaveRNN (reference wavernn/model.py:95-211)."""

    def __init__(self, rnn_dims=512, fc_dims=512, feat_dims=80,
                 aux_dims=32, n_classes=30, **up_kwargs):
        super().__init__()
        self.aux_dims = aux_dims
        self.upsample = MirrorUpsample(feat_dims=feat_dims, **up_kwargs)
        self.I = nn.Linear(feat_dims + aux_dims + 1, rnn_dims)
        self.rnn1 = nn.GRU(rnn_dims, rnn_dims, batch_first=True)
        self.rnn2 = nn.GRU(rnn_dims + aux_dims, rnn_dims, batch_first=True)
        self.fc1 = nn.Linear(rnn_dims + aux_dims, fc_dims)
        self.fc2 = nn.Linear(fc_dims + aux_dims, fc_dims)
        self.fc3 = nn.Linear(fc_dims, n_classes)

    def forward(self, x, mels):
        mels, aux = self.upsample(mels)
        d = self.aux_dims
        a1, a2, a3, a4 = (aux[:, :, i * d:(i + 1) * d] for i in range(4))
        x = torch.cat([x.unsqueeze(-1), mels, a1], dim=2)
        x = self.I(x)
        res = x
        x, _ = self.rnn1(x)
        x = x + res
        res = x
        x, _ = self.rnn2(torch.cat([x, a2], dim=2))
        x = x + res
        x = F.relu(self.fc1(torch.cat([x, a3], dim=2)))
        x = F.relu(self.fc2(torch.cat([x, a4], dim=2)))
        return self.fc3(x)
